"""Streaming twin of the sequence-gap audit (r5 verdict ask 6): the
event-time audits are batch queries over event time; this pins the
file-source streaming formulation to the batch result (A4
converged-state-equals-batch) and the emit-per-update contract.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from _kafka_streams_scaffold_spark.operators import dq
from _kafka_streams_scaffold_spark.streaming import pipeline, serving

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
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


def test_streaming_sequence_gap_converges_to_batch(
    spark, tmp_path, monkeypatch
):
    # ids 1..5 with 4 missing (gap) and 2 delivered twice (dup),
    # split across two files -> two micro-batches
    batch1 = [{"event_id": i, "user_id": 10 + i} for i in (1, 2, 3)]
    batch2 = [{"event_id": i, "user_id": 10 + i} for i in (2, 5)]
    src = str(tmp_path / "src")
    _write_json(src, "a.json", batch1)
    _write_json(src, "b.json", batch2)

    store = serving.MemoryStore(["event_id"])
    agg = pipeline.streaming_sequence_counts(_stream(spark, src))
    q = pipeline.run_update_into_store(agg, store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    summary = pipeline.sequence_gap_summary(store)

    # batch query over the SAME records
    df = spark.createDataFrame(
        [(r["event_id"], r["user_id"]) for r in batch1 + batch2], SCHEMA
    )
    monkeypatch.setattr(dq.tables, "table", lambda *_a: df)
    batch_row = dq.sequence_gap_audit_query(spark, "unused").collect()[0]

    assert summary == batch_row.asDict()
    assert summary["n_missing"] == 1  # id 4 never arrived
    assert summary["n_dup"] == 1  # id 2 delivered twice


def test_streaming_sequence_counts_emit_per_update(spark, tmp_path):
    """A4: each micro-batch re-emits the ids it touched with the NEW
    count — the store observes the dup's count move 1 -> 2 across
    two separate availableNow runs against one checkpoint."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = serving.MemoryStore(["event_id"])

    _write_json(src, "a.json", [{"event_id": 7, "user_id": 1}])
    agg = pipeline.streaming_sequence_counts(_stream(spark, src))
    q = pipeline.run_update_into_store(agg, store, ckpt)
    q.awaitTermination(120)
    assert store.get(7)["copies"] == 1

    _write_json(src, "b.json", [{"event_id": 7, "user_id": 2}])
    agg2 = pipeline.streaming_sequence_counts(_stream(spark, src))
    q2 = pipeline.run_update_into_store(agg2, store, ckpt)
    q2.awaitTermination(120)
    # state restored from checkpoint, a.json not re-read, count updated
    assert store.get(7)["copies"] == 2
    assert pipeline.sequence_gap_summary(store)["n_dup"] == 1


def test_sequence_gap_summary_empty_store():
    store = serving.MemoryStore(["event_id"])
    s = pipeline.sequence_gap_summary(store)
    assert s["n_rows"] == 0 and s["n_dup"] == 0
    assert s["min_id"] is None and s["n_missing"] is None
