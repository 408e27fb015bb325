"""Reference-parity operator tests: purchases aggregation golden
semantics (``PurchasesTopology.java:62-66``), poison-pill skip
(``ReplaceThreadTests.java:133-154``), dynamic-JSON enrich
(``JsonObjectSerdeTests.java:61-77``), JSON-Schema conversion
(``Purchase.json`` / ``CountAndTotal.json``)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from _kafka_streams_scaffold_spark.functions import json_schema
from _kafka_streams_scaffold_spark.operators import mapvalues, purchases


def test_purchases_count_and_total(spark):
    rows = [
        Row(user_id=1, event_type="p1", value=2.0),
        Row(user_id=1, event_type="p1", value=3.0),
        Row(user_id=1, event_type="p2", value=5.0),
        Row(user_id=2, event_type="p1", value=7.0),
    ]
    df = purchases.aggregate_count_and_total(
        purchases.select_compound_key(spark.createDataFrame(rows))
    )
    got = {r["key"]: (r["cnt"], r["total"]) for r in df.collect()}
    assert got == {"1-p1": (2, 5.0), "1-p2": (1, 5.0), "2-p1": (1, 7.0)}


def test_range_scan_prefix_does_not_leak(spark):
    rows = [
        Row(user_id=7, event_type="a", value=1.0),
        Row(user_id=70, event_type="a", value=1.0),
        Row(user_id=7, event_type="b", value=1.0),
    ]
    agg = purchases.aggregate_count_and_total(
        purchases.select_compound_key(spark.createDataFrame(rows))
    )
    keys = {r["key"] for r in purchases.range_scan(agg, "7").collect()}
    assert keys == {"7-a", "7-b"}


def test_poison_pill_skip_and_continue(spark):
    # Reference sequence: moo, moo moo, quack, moo moo moo -> the
    # quack record is dropped, everything else continues uppercased.
    rows = [Row(text=s) for s in ["moo", "moo moo", "quack", "moo moo moo", "oink"]]
    df = spark.createDataFrame(rows)
    out = [r["value"] for r in mapvalues.uppercase(df).collect()]
    assert out == ["MOO", "MOO MOO", "MOO MOO MOO", "OINK"]
    bad = mapvalues.quarantine(df).collect()
    assert len(bad) == 1 and bad[0]["text"] == "quack"


def test_json_enrich_preserves_and_adds(spark):
    df = spark.createDataFrame([Row(event_id=1, props='{"k": 42}')])
    row = mapvalues.json_enrich(df).collect()[0]
    assert row["k"] == 42 and row["processed"] is True
    assert row["json_out"] == '{"k": 42, "processed": true}'


def test_json_schema_to_struct_purchase():
    # Mirrors model-json/src/main/resources/schemas/Purchase.json
    schema = {
        "type": "object",
        "properties": {
            "customerId": {"type": "integer"},
            "productId": {"type": "integer"},
            "quantity": {"type": "integer"},
        },
        "required": ["customerId", "productId", "quantity"],
    }
    struct = json_schema.json_schema_to_struct(schema)
    assert struct == T.StructType(
        [
            T.StructField("customerId", T.LongType(), False),
            T.StructField("productId", T.LongType(), False),
            T.StructField("quantity", T.LongType(), False),
        ]
    )


def test_permissive_parse_quarantine(spark):
    struct = json_schema.json_schema_to_struct(
        {"type": "object", "properties": {"k": {"type": "integer"}}}
    )
    df = spark.createDataFrame(
        [Row(id=1, payload='{"k": 1}'), Row(id=2, payload="{oops"), Row(id=3, payload='{"k": 3}')]
    )
    parsed = json_schema.parse_json_permissive(df, "payload", struct)
    good = json_schema.good_records(parsed)
    bad = json_schema.quarantined_records(parsed)
    assert sorted(r["k"] for r in good.collect()) == [1, 3]
    assert [r["id"] for r in bad.collect()] == [2]


def test_peek_observation_metrics(spark):
    """P5: observe() computes metrics inline with the plan — the
    record-level peek side effect, minus the per-record crossing."""
    from pyspark.sql import Row
    from _kafka_streams_scaffold_spark.operators import mapvalues

    df = spark.createDataFrame(
        [Row(k="a", v=1), Row(k="a", v=2), Row(k="b", v=3)]
    )
    observed, obs = mapvalues.peek(df, "probe")
    assert observed.count() == 3  # action completes the observation
    assert obs.get == {"n_rows": 3, "n_distinct_first_col": 2}
