"""Streaming twin of the incremental-join-view maintainer: feeding
the bilinear delta rows through a KTable-style update-mode aggregation
must converge to the batch view (A4 emit-per-update contract), with
V_old + converged deltas equal to a full recompute over the new
snapshots — the maintenance identity holding across micro-batch
boundaries and a checkpoint restart."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from _kafka_streams_scaffold_spark.operators import temporal
from _kafka_streams_scaffold_spark.streaming import pipeline, serving

SF = "/root/testdata/sf0.001"

DELTA_SCHEMA = T.StructType(
    [
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _pieces(spark):
    from _kafka_streams_scaffold_spark import tables

    orders = tables.table(spark, SF, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cust = tables.table(spark, SF, "customer").select(
        "c_custkey", "c_nationkey"
    )
    return temporal.ivm_pieces(orders, cust)


def _write_jsonl(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _delta_files(spark, src, split=1):
    """Materialize the signed delta rows into `split` jsonl files —
    each becomes one micro-batch (maxFilesPerTrigger=1)."""
    _, delta_rows = _pieces(spark)
    rows = [
        {
            "c_nationkey": int(r["c_nationkey"]),
            "w": int(r["w"]),
            "cents": int(r["cents"]),
        }
        for r in delta_rows.collect()
    ]
    chunks = [rows[i::split] for i in range(split)]
    names = []
    for i, chunk in enumerate(chunks):
        name = f"d{i}.json"
        _write_jsonl(src, name, chunk)
        names.append(name)
    # pin mtimes so micro-batch order is deterministic (file streams
    # order by modification time)
    for i, name in enumerate(names):
        p = os.path.join(src, name)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return len(rows)


def _converged_view(spark, store):
    v_old, _ = _pieces(spark)
    state = {k[0]: dict(v) for k, v in store.snapshot().items()}
    merged = {}
    for r in v_old.collect():
        merged[r["c_nationkey"]] = [int(r["p"]), int(r["r"])]
    for nk, row in state.items():
        cur = merged.setdefault(nk, [0, 0])
        cur[0] += int(row["dp"])
        cur[1] += int(row["dr"])
    return {
        nk: (p, r) for nk, (p, r) in merged.items() if p > 0
    }


def test_streaming_ivm_converges_to_batch_view(spark, tmp_path):
    src = str(tmp_path / "src")
    n_rows = _delta_files(spark, src, split=3)
    assert n_rows > 0, "churn produced no delta rows"

    stream = (
        spark.readStream.schema(DELTA_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    store = serving.MemoryStore(["c_nationkey"])
    q = pipeline.run_update_into_store(
        pipeline.streaming_ivm_deltas(stream), store, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = _converged_view(spark, store)
    batch = {
        r["c_nationkey"]: (r["n_pairs"], r["revenue_cents"])
        for r in temporal.ivm_join_revenue_query(spark, SF).collect()
    }
    assert got == batch


def test_streaming_ivm_checkpoint_restart(spark, tmp_path):
    """The maintained sums must survive a restart: half the deltas in
    run 1, the rest in run 2 against the same checkpoint — the
    converged view is identical to the single-run one."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _, delta_rows = _pieces(spark)
    rows = [
        {
            "c_nationkey": int(r["c_nationkey"]),
            "w": int(r["w"]),
            "cents": int(r["cents"]),
        }
        for r in delta_rows.collect()
    ]
    half = len(rows) // 2
    store = serving.MemoryStore(["c_nationkey"])

    def _run():
        stream = (
            spark.readStream.schema(DELTA_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )
        q = pipeline.run_update_into_store(
            pipeline.streaming_ivm_deltas(stream), store, ckpt
        )
        q.awaitTermination(120)

    _write_jsonl(src, "a.json", rows[:half])
    os.utime(os.path.join(src, "a.json"), (1_700_000_000, 1_700_000_000))
    _run()
    _write_jsonl(src, "b.json", rows[half:])
    os.utime(os.path.join(src, "b.json"), (1_700_000_001, 1_700_000_001))
    _run()

    got = _converged_view(spark, store)
    batch = {
        r["c_nationkey"]: (r["n_pairs"], r["revenue_cents"])
        for r in temporal.ivm_join_revenue_query(spark, SF).collect()
    }
    assert got == batch
