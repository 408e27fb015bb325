"""Streaming twin of the bottom-K priority sample: the K-row
reservoir state must converge to the batch sample over the same
records (A4), including across a checkpoint restart — mergeability of
bottom-k is what makes K rows of state sufficient."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from _kafka_streams_scaffold_spark import tables
from _kafka_streams_scaffold_spark.operators import sampling
from _kafka_streams_scaffold_spark.streaming import (
    pipeline,
    serving,
    stateful,
)

SF = "/root/testdata/sf0.001"

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
    ]
)


def _write_jsonl(dirpath, name, rows, mtime):
    os.makedirs(dirpath, exist_ok=True)
    p = os.path.join(dirpath, name)
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(p, (mtime, mtime))


def _batch_sample(spark):
    return {
        i + 1: (r["doc_id"], r["source"], r["priority"])
        for i, r in enumerate(
            sampling.priority_sample_query(spark, SF).collect()
        )
    }


def _stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )


def test_streaming_priority_sample_converges_to_batch(spark, tmp_path):
    docs = [
        {"doc_id": int(r["doc_id"]), "source": r["source"]}
        for r in tables.table(spark, SF, "documents")
        .select("doc_id", "source")
        .collect()
    ]
    src = str(tmp_path / "src")
    third = len(docs) // 3
    _write_jsonl(src, "a.json", docs[:third], 1_700_000_000)
    _write_jsonl(src, "b.json", docs[third : 2 * third], 1_700_000_001)
    _write_jsonl(src, "c.json", docs[2 * third :], 1_700_000_002)

    store = serving.MemoryStore(["rank"])
    q = pipeline.run_update_into_store(
        stateful.streaming_priority_sample(_stream(spark, src)),
        store,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {
        k[0]: (v["doc_id"], v["source"], v["priority"])
        for k, v in store.snapshot().items()
    }
    assert got == _batch_sample(spark)


def test_streaming_priority_sample_checkpoint_restart(spark, tmp_path):
    docs = [
        {"doc_id": int(r["doc_id"]), "source": r["source"]}
        for r in tables.table(spark, SF, "documents")
        .select("doc_id", "source")
        .collect()
    ]
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = serving.MemoryStore(["rank"])
    half = len(docs) // 2

    _write_jsonl(src, "a.json", docs[:half], 1_700_000_000)
    q1 = pipeline.run_update_into_store(
        stateful.streaming_priority_sample(_stream(spark, src)), store, ckpt
    )
    q1.awaitTermination(180)

    _write_jsonl(src, "b.json", docs[half:], 1_700_000_001)
    q2 = pipeline.run_update_into_store(
        stateful.streaming_priority_sample(_stream(spark, src)), store, ckpt
    )
    q2.awaitTermination(180)

    got = {
        k[0]: (v["doc_id"], v["source"], v["priority"])
        for k, v in store.snapshot().items()
    }
    assert got == _batch_sample(spark)
