"""Round-10 streaming twin: the Page-Hinkley mean-shift detector
maintained as state over a file stream, asserted to CONVERGE to the
batch operator's final day row over the same inputs (the A4
emit-per-update contract, streaming_sprt's harness)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from _kafka_streams_scaffold_spark import tables
from _kafka_streams_scaffold_spark.operators import drift
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


def test_streaming_page_hinkley_converges_to_batch_final_day(
    spark, tmp_path
):
    daily = [
        {"metric": "events", "day": int(r["day_idx"]), "x": int(r["x"])}
        for r in tables.table(spark, SF, "events")
        .groupBy(
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("day_idx")
        )
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    ]
    # split mid-day too: the second file re-increments a day the first
    # file already delivered, exercising the in-place spine update
    daily_sorted = sorted(daily, key=lambda r: r["day"])
    half = [dict(r, x=r["x"] // 2) for r in daily_sorted]
    rest = [
        dict(r, x=r["x"] - r["x"] // 2)
        for r in daily_sorted
        if r["x"] - r["x"] // 2 > 0
    ]
    src = str(tmp_path / "src")
    _write_jsonl(src, "a.json", half, 1_700_000_000)
    _write_jsonl(src, "b.json", rest, 1_700_000_001)

    schema = T.StructType(
        [
            T.StructField("metric", T.StringType()),
            T.StructField("day", T.LongType()),
            T.StructField("x", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    store = serving.MemoryStore(["metric"])
    q = pipeline.run_update_into_store(
        stateful.streaming_page_hinkley(stream),
        store,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = store.snapshot()[("events",)]
    batch = sorted(
        drift.page_hinkley_drift_query(spark, SF).collect(),
        key=lambda r: r["day"],
    )
    final = batch[-1]
    assert got["n_days"] == len(batch)
    assert got["v_stat"] == final["v_stat"]
    assert got["ph_stat"] == final["ph_stat"]
    assert got["alarm"] == final["alarm"]
