"""Round-9 streaming twins: the latched SPRT sequential test and the
per-user first/last-touch attribution, each maintained as state over a
file stream and asserted to CONVERGE to the batch operator over the
same inputs (the A4 emit-per-update contract)."""

from __future__ import annotations

import json
import os
from collections import Counter

from pyspark.sql import functions as F
from pyspark.sql import types as T

from _kafka_streams_scaffold_spark import tables
from _kafka_streams_scaffold_spark.operators import analytics, inference
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


def test_streaming_sprt_converges_to_batch_final_day(spark, tmp_path):
    daily = [
        {
            "metric": "purchase_share",
            "day": int(r["day_idx"]),
            "k": int(r["k"]),
            "m": int(r["m"]),
        }
        for r in tables.table(spark, SF, "events")
        .groupBy(
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("day_idx")
        )
        .agg(
            F.sum(
                (F.col("event_type") == "purchase").cast("bigint")
            ).alias("k"),
            F.count(F.lit(1)).alias("m"),
        )
        .collect()
    ]
    src = str(tmp_path / "src")
    third = len(daily) // 3
    _write_jsonl(src, "a.json", daily[:third], 1_700_000_000)
    _write_jsonl(src, "b.json", daily[third : 2 * third], 1_700_000_001)
    _write_jsonl(src, "c.json", daily[2 * third :], 1_700_000_002)

    schema = T.StructType(
        [
            T.StructField("metric", T.StringType()),
            T.StructField("day", T.LongType()),
            T.StructField("k", T.LongType()),
            T.StructField("m", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    store = serving.MemoryStore(["metric"])
    q = pipeline.run_update_into_store(
        stateful.streaming_sprt(stream),
        store,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = store.snapshot()[("purchase_share",)]
    batch = sorted(
        inference.sprt_daily_decision_query(spark, SF).collect(),
        key=lambda r: r["day"],
    )
    final = batch[-1]
    assert got["n_days"] == len(batch)
    assert got["k_cum"] == final["k_cum"]
    assert got["m_cum"] == final["m_cum"]
    assert abs(got["llr"] - final["llr"]) < 1e-12
    assert got["state"] == final["state"]


def test_streaming_attribution_converges_to_batch(spark, tmp_path):
    ev = [
        {
            "user_id": int(r["user_id"]),
            "ts": r["ts"].isoformat(),
            "event_id": int(r["event_id"]),
            "event_type": r["event_type"],
            "cents": int(r["cents"]),
        }
        for r in sorted(
            tables.table(spark, SF, "events")
            .select(
                "user_id",
                "ts",
                "event_id",
                "event_type",
                F.floor(F.col("value") * 100).cast("bigint").alias(
                    "cents"
                ),
            )
            .collect(),
            key=lambda r: (r["ts"], r["event_id"]),
        )
    ]
    src = str(tmp_path / "src")
    third = len(ev) // 3
    _write_jsonl(src, "a.json", ev[:third], 1_700_000_000)
    _write_jsonl(src, "b.json", ev[third : 2 * third], 1_700_000_001)
    _write_jsonl(src, "c.json", ev[2 * third :], 1_700_000_002)

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.StringType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("cents", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    store = serving.MemoryStore(["event_id"])
    q = pipeline.run_update_into_store(
        stateful.streaming_attribution(stream),
        store,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    first_tot: Counter = Counter()
    last_tot: Counter = Counter()
    n_first: Counter = Counter()
    n_last: Counter = Counter()
    for _, v in store.snapshot().items():
        first_tot[v["first_ch"]] += v["cents"]
        n_first[v["first_ch"]] += 1
        last_tot[v["last_ch"]] += v["cents"]
        n_last[v["last_ch"]] += 1
    batch = {(r["model"], r["channel"]): r for r in
             analytics.revenue_attribution_query(spark, SF).collect()}
    for (model, ch), row in batch.items():
        tot = first_tot if model == "first" else last_tot
        n = n_first if model == "first" else n_last
        assert tot[ch] == row["cents"], (model, ch)
        assert n[ch] == row["n_purchases"], (model, ch)
