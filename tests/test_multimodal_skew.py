"""Multimodal plumbing + salted-aggregation tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark.operators import multimodal, skew


def _docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=0, text="abcdefghij"), Row(doc_id=1, text="")]
    )


def test_decode_features_fake(spark):
    out = multimodal.decode_features(multimodal.with_payload(_docs(spark)))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["n_bytes"] == 10
    assert rows[0]["first_byte"] == ord("a")
    assert rows[0]["checksum"] == hashlib.md5(b"abcdefghij").hexdigest()
    assert rows[1]["n_bytes"] == 0 and rows[1]["first_byte"] == -1


def test_decode_real_rejects_unframed_payloads(spark):
    """Round 11: decode="real" routes to the TIMG/TAUD codec
    (operators/codec.py) instead of raising NotImplementedError.
    This module's payloads are UNFRAMED text bytes, so the real path
    must still fail loudly on them (unknown-magic ValueError) —
    containerized data goes through codec.with_coded_payload."""
    out = multimodal.decode_features(
        multimodal.with_payload(_docs(spark)), decode="real"
    )
    with pytest.raises(Exception, match="unknown codec magic"):
        out.collect()


def test_frame_sample_covers_payload(spark):
    out = multimodal.frame_sample(multimodal.with_payload(_docs(spark)))
    rows = [r for r in out.collect() if r["doc_id"] == 0]
    assert [r["frame_id"] for r in sorted(rows, key=lambda r: r["frame_id"])] == [
        0,
        1,
        2,
        3,
    ]
    # chunks partition the payload: sizes sum to the original length
    assert sum(r["frame_bytes"] for r in rows) == 10
    # frame 0 of "abcdefghij" split in 4 -> "ab"
    first = next(r for r in rows if r["frame_id"] == 0)
    assert first["frame_checksum"] == hashlib.md5(b"ab").hexdigest()


def test_salted_agg_equals_plain(spark, monkeypatch):
    rows = [
        Row(event_id=i, user_id=1 if i < 90 else 2, event_type="hot", value=1.5)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(skew.tables, "table", lambda *a: df)
    got = {
        r["key"]: (r["cnt"], r["total"])
        for r in skew.purchases_agg_salted_query(spark, "_").collect()
    }
    assert got == {"1-hot": (90, 135.0), "2-hot": (10, 15.0)}
