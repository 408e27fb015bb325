"""Streaming twin of the watermark-lag audit: converged stateful
state must equal the batch query (A4), including across a checkpoint
restart, and the lateness fold must see events in event_id order."""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import types as T

from _kafka_streams_scaffold_spark.operators import dq
from _kafka_streams_scaffold_spark.streaming import serving, stateful

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _write_json(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _stream(spark, dirpath):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(dirpath)
    )


def _evs(rows):
    return [
        {
            "event_id": i,
            "ts": ts.strftime("%Y-%m-%dT%H:%M:%S"),
            "event_type": t,
        }
        for i, ts, t in rows
    ]


def test_streaming_watermark_lag_converges_to_batch(
    spark, tmp_path, monkeypatch
):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, "click"),
        (2, base + dt.timedelta(seconds=100), "click"),
        (3, base + dt.timedelta(seconds=40), "click"),   # 60s late
        (4, base + dt.timedelta(seconds=100), "click"),  # on time
        (5, base + dt.timedelta(seconds=70), "click"),   # 30s late
        (6, base, "view"),
        (7, base - dt.timedelta(seconds=10), "view"),    # 10s late
    ]
    src = str(tmp_path / "src")
    _write_json(src, "a.json", _evs(rows[:3]))
    _write_json(src, "b.json", _evs(rows[3:]))

    from _kafka_streams_scaffold_spark.streaming import pipeline

    store = serving.MemoryStore(["event_type"])
    agg = stateful.streaming_watermark_lag(_stream(spark, src))
    q = pipeline.run_update_into_store(agg, store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    df = spark.createDataFrame(
        [(i, ts, t) for i, ts, t in rows], SCHEMA
    )
    monkeypatch.setattr(dq.tables, "table", lambda *_a: df)
    batch = {
        r["event_type"]: r.asDict()
        for r in dq.watermark_lag_audit_query(spark, "unused").collect()
    }
    converged = {k[0]: dict(v) for k, v in store.snapshot().items()}
    assert converged == batch
    assert converged["click"]["n_late"] == 2
    assert converged["click"]["max_late_s"] == 60
    assert converged["click"]["avg_late_s"] == 45.0
    assert converged["view"]["n_late"] == 1


def test_streaming_watermark_lag_checkpoint_restart(spark, tmp_path):
    """State (running max + sums) must survive a restart: the late
    event in run 2 is judged against run 1's running max."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = serving.MemoryStore(["event_type"])

    from _kafka_streams_scaffold_spark.streaming import pipeline

    _write_json(src, "a.json", _evs([(1, base + dt.timedelta(seconds=500), "click")]))
    q1 = pipeline.run_update_into_store(
        stateful.streaming_watermark_lag(_stream(spark, src)), store, ckpt
    )
    q1.awaitTermination(120)
    assert store.get("click")["n_late"] == 0

    _write_json(src, "b.json", _evs([(2, base, "click")]))  # 500s late
    q2 = pipeline.run_update_into_store(
        stateful.streaming_watermark_lag(_stream(spark, src)), store, ckpt
    )
    q2.awaitTermination(120)
    r = store.get("click")
    assert r["n_events"] == 2 and r["n_late"] == 1
    assert r["max_late_s"] == 500 and r["avg_late_s"] == 500.0
