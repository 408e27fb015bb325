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


def test_int8_ann_scales_cancel_and_rank_matches_exact_on_separable_data(
    spark, monkeypatch
):
    """On well-separated vectors the int8 search must reproduce the
    exact ranking; scaling a vector must not change its cosine
    neighborhood (the scale cancels in the quantized cosine)."""
    vecs = [
        [1.0, 0.0, 0.0, 0.0],      # q0
        [100.0, 1.0, 0.0, 0.0],    # near q0, large magnitude
        [0.0, 1.0, 0.0, 0.0],      # orthogonal
        [-1.0, 0.0, 0.0, 0.0],     # opposite
    ]
    monkeypatch.setattr(quantize.tables, "table", lambda *a: _emb(spark, vecs))
    monkeypatch.setattr(quantize, "N_QUERIES", 1)
    monkeypatch.setattr(quantize, "TOP_K", 3)
    got = {
        r["rank"]: (r["n_id"], r["qcos"])
        for r in quantize.int8_ann_query(spark, "_").collect()
    }
    assert [got[r][0] for r in (1, 2, 3)] == [1, 2, 3]
    assert got[1][1] > 0.99          # same direction despite 100x scale
    assert abs(got[2][1]) < 0.02     # orthogonal
    assert got[3][1] == -1.0         # opposite is exactly -1 in int8


def test_int8_ann_excludes_zero_vectors(spark, monkeypatch):
    vecs = [[1.0, 0.0], [0.0, 0.0], [0.5, 0.5]]
    monkeypatch.setattr(quantize.tables, "table", lambda *a: _emb(spark, vecs))
    monkeypatch.setattr(quantize, "N_QUERIES", 3)
    monkeypatch.setattr(quantize, "TOP_K", 5)
    out = quantize.int8_ann_query(spark, "_").collect()
    ids = {r["q_id"] for r in out} | {r["n_id"] for r in out}
    assert 1 not in ids  # the zero vector has no direction


def test_int8_ann_recall_on_testdata(spark, sf_dir):
    rows = quantize.int8_ann_recall_query(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
    # int8 quantization costs ~0.3% cosine error; at k=5 the macro
    # recall should stay high
    macro = sum(r["n_hits"] for r in rows) / sum(r["n_exact"] for r in rows)
    assert macro >= 0.8
