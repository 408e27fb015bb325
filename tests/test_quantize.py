"""Tests for int8 embedding quantization."""

from __future__ import annotations

from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import quantize


def _emb(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )


def test_quantize_roundtrip_error_bounded(spark, monkeypatch):
    vecs = [[0.5, -1.0, 0.25, 0.125], [3.0, 0.0, -3.0, 1.5]]
    monkeypatch.setattr(quantize.tables, "table", lambda *a: _emb(spark, vecs))
    rows = {r["vec_id"]: r for r in quantize.embedding_quantize_query(spark, "_").collect()}
    for i, v in enumerate(vecs):
        scale = rows[i]["scale"]
        q = [int(c) for c in rows[i]["q"].split(",")]
        assert max(abs(x) for x in v) / 127 == scale
        assert all(-127 <= c <= 127 for c in q)
        # half-up rounding => reconstruction within scale/2 per element
        for x, c in zip(v, q):
            assert abs(x - c * scale) <= scale / 2 + 1e-12


def test_quantize_zero_vector_guard(spark, monkeypatch):
    monkeypatch.setattr(
        quantize.tables, "table", lambda *a: _emb(spark, [[0.0, 0.0, 0.0]])
    )
    r = quantize.embedding_quantize_query(spark, "_").collect()[0]
    assert r["scale"] == 0.0
    assert r["q"] == "0,0,0"
    err = quantize.quantization_error_query(spark, "_").collect()[0]
    assert err["n_vecs"] == 1
    assert err["mean_abs_err"] == 0.0


def test_quantization_error_small(spark, monkeypatch):
    vecs = [[1.0, -0.5, 0.25, 0.7], [0.9, 0.3, -0.2, 0.1]]
    monkeypatch.setattr(quantize.tables, "table", lambda *a: _emb(spark, vecs))
    err = quantize.quantization_error_query(spark, "_").collect()[0]
    assert err["n_elems"] == 8
    # int8 symmetric error is bounded by max_scale/2 on average
    assert 0.0 <= err["mean_abs_err"] <= (1.0 / 127) / 2 + 1e-9
