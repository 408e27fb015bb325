"""Streaming HLL: the register table as streaming state must converge
to EXACTLY the batch operator's registers (same md5 chain), so the
estimate derived from any converged snapshot equals the batch
estimate bit-for-bit — the emit-per-update contract on the sketch
tier."""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import types as T

from _kafka_streams_scaffold_spark.operators import sketches
from _kafka_streams_scaffold_spark.streaming import pipeline, serving

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _write_json(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _estimate(regs_for_type):
    wbits = sketches._HLL_WBITS
    s = sum(2 ** (wbits + 1 - mk) for mk in regs_for_type.values())
    s += (sketches.HLL_M - len(regs_for_type)) * 2 ** (wbits + 1)
    return (
        sketches.HLL_ALPHA
        * sketches.HLL_M
        * sketches.HLL_M
        * 2 ** (wbits + 1)
        / s
    )


def test_streaming_hll_registers_converge_to_batch(spark, tmp_path,
                                                   monkeypatch):
    rows = [
        {
            "event_id": i,
            "ts": "2024-01-01T00:00:00",
            "user_id": i % 37,
            "event_type": "click" if i % 2 else "view",
            "value": 1.0,
            "props": "{}",
        }
        for i in range(200)
    ]
    src = str(tmp_path / "src")
    # two micro-batches: registers must max-merge THROUGH the state
    # store, not within one batch
    _write_json(src, "a.json", rows[:120])
    _write_json(src, "b.json", rows[120:])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    agg = pipeline.streaming_hll_registers(stream)
    store = serving.MemoryStore(["event_type", "r"])
    q = pipeline.run_update_into_store(agg, store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got: dict[str, dict[int, int]] = {}
    for k, v in store.snapshot().items():
        got.setdefault(k[0], {})[k[1]] = v["mk"]

    batch_df = spark.createDataFrame(
        [
            (
                r["event_id"],
                r["user_id"],
                r["event_type"],
            )
            for r in rows
        ],
        "event_id long, user_id long, event_type string",
    )
    monkeypatch.setattr(sketches.tables, "table", lambda *a: batch_df)
    want = {
        r["event_type"]: r
        for r in sketches.hll_user_sketch_query(spark, "_").collect()
    }
    assert set(got) == set(want)
    for et, regs in got.items():
        # exact register-count equality, then bit-exact estimate
        assert len(regs) == want[et]["m_used"]
        assert math.isclose(
            _estimate(regs), want[et]["hll_estimate"], rel_tol=0,
            abs_tol=0.0,
        )
