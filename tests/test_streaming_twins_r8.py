"""Round-8 streaming twins: the per-day session-concurrency sweep and
the per-type CUSUM changepoint, each maintained as state over a file
stream and asserted to CONVERGE to the batch operator over the same
inputs (the A4 emit-per-update contract — an upsert store keyed by the
group key ends exactly at the batch answer)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from _kafka_streams_scaffold_spark import tables
from _kafka_streams_scaffold_spark.operators import analytics, stats
from _kafka_streams_scaffold_spark.streaming import (
    pipeline,
    serving,
    stateful,
)

SF = "/root/testdata/sf0.001"


def _write_jsonl(dirpath, name, rows, mtime):
    os.makedirs(dirpath, exist_ok=True)
    p = os.path.join(dirpath, name)
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(p, (mtime, mtime))


def test_streaming_session_concurrency_converges_to_batch(spark, tmp_path):
    segs = [
        {"d": int(r["d"]), "a": int(r["a"]), "b": int(r["b"])}
        for r in analytics.session_day_segments(spark, SF).collect()
    ]
    src = str(tmp_path / "src")
    third = len(segs) // 3
    _write_jsonl(src, "a.json", segs[:third], 1_700_000_000)
    _write_jsonl(src, "b.json", segs[third : 2 * third], 1_700_000_001)
    _write_jsonl(src, "c.json", segs[2 * third :], 1_700_000_002)

    schema = T.StructType(
        [
            T.StructField("d", T.LongType()),
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    store = serving.MemoryStore(["d"])
    q = pipeline.run_update_into_store(
        stateful.streaming_session_concurrency(stream),
        store,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {
        k[0]: (v["n_sessions"], v["max_concurrent"])
        for k, v in store.snapshot().items()
    }
    batch = {
        int(
            r["day"].toordinal() - __import__("datetime").date(
                1970, 1, 1
            ).toordinal()
        ): (r["n_sessions"], r["max_concurrent"])
        for r in analytics.session_concurrency_query(spark, SF).collect()
    }
    assert got == batch


def test_streaming_cusum_converges_to_batch(spark, tmp_path):
    ev = [
        {"event_type": r["event_type"], "day": int(r["day_idx"])}
        for r in tables.table(spark, SF, "events")
        .select(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("day_idx"),
        )
        .collect()
    ]
    src = str(tmp_path / "src")
    third = len(ev) // 3
    _write_jsonl(src, "a.json", ev[:third], 1_700_000_000)
    _write_jsonl(src, "b.json", ev[third : 2 * third], 1_700_000_001)
    _write_jsonl(src, "c.json", ev[2 * third :], 1_700_000_002)

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("day", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    store = serving.MemoryStore(["event_type"])
    q = pipeline.run_update_into_store(
        stateful.streaming_cusum_changepoint(stream),
        store,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {
        k[0]: (
            v["changepoint_day"],
            v["n_days"],
            v["cusum_scaled"],
            v["direction"],
        )
        for k, v in store.snapshot().items()
    }
    import datetime

    epoch = datetime.date(1970, 1, 1)
    batch = {
        r["event_type"]: (
            (r["changepoint_day"] - epoch).days,
            r["n_days"],
            r["cusum_scaled"],
            r["direction"],
        )
        for r in stats.cusum_changepoint_query(spark, SF).collect()
    }
    assert got == batch
