"""BM25 retrieval and changelog-compaction tests."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from _kafka_streams_scaffold_spark import plans
from _kafka_streams_scaffold_spark.operators import changelog, textops


def test_bm25_ranking_golden(spark, sf_dir, monkeypatch):
    docs = spark.createDataFrame(
        [
            # doc 1: both query terms, short -> top
            Row(doc_id=1, text="join vector join"),
            # doc 2: one term, diluted by length
            Row(doc_id=2, text="join " + "filler " * 30),
            # doc 3: no query terms
            Row(doc_id=3, text="nothing relevant here"),
            # doc 4: rare term 'vector' only
            Row(doc_id=4, text="vector things"),
        ]
    )
    monkeypatch.setattr(textops.tables, "table", lambda *a: docs)
    monkeypatch.setattr(textops.tables, "spread", lambda df, *a, **k: df)
    rows = textops.bm25_search_query(spark, sf_dir).collect()
    ranked = [r["doc_id"] for r in rows]
    scores = {r["doc_id"]: r["bm25"] for r in rows}
    assert ranked[0] == 1
    # every scored doc present (k=10 > corpus), no-term doc scores 0
    assert set(ranked) == {1, 2, 3, 4}
    assert scores[3] == pytest.approx(0.0)
    # doc with a matching term always outranks the no-term doc
    assert scores[4] > scores[3]
    assert scores[2] > scores[3]


def test_bm25_plan_topk_no_global_sort(spark, sf_dir):
    explained = plans.explain_str(textops.bm25_search_query(spark, sf_dir))
    assert "TakeOrderedAndProject" in explained


def _ev(eid, user, ts, typ, value):
    return Row(
        event_id=eid,
        user_id=user,
        ts=dt.datetime.fromisoformat(ts),
        event_type=typ,
        value=value,
    )


def test_ktable_latest_golden(spark, sf_dir, monkeypatch):
    rows = [
        _ev(1, 1, "2024-01-01T00:00:00", "signup", 1.0),
        _ev(2, 1, "2024-01-02T00:00:00", "click", 2.0),
        # same ts as event 4: higher event_id (Kafka-offset analog) wins
        _ev(3, 2, "2024-01-01T00:00:00", "view", 3.0),
        _ev(4, 2, "2024-01-01T00:00:00", "purchase", 4.0),
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(changelog.tables, "table", lambda *a: df)
    got = {
        r["user_id"]: (r["last_type"], r["last_value"])
        for r in changelog.ktable_latest_query(spark, sf_dir).collect()
    }
    assert got == {1: ("click", 2.0), 2: ("purchase", 4.0)}


def test_dyn_ivf_assign_properties(spark, sf_dir):
    """Dynamic-k sub-quantizer invariants: every vector lands on a
    seed of its own coarse cell; the seed count per coarse cell is
    ceil(cell_n / target); and each vector's chosen seed is truly its
    nearest (numpy cross-check on a sample)."""
    import math

    import numpy as np

    from _kafka_streams_scaffold_spark.operators import similarity as S
    from _kafka_streams_scaffold_spark import pinning, tables

    assign = S.dyn_ivf_assign_query(spark, sf_dir).collect()
    coarse = {
        r["vec_id"]: r["assigned_label"]
        for r in S.ivf_assign_query(spark, sf_dir).collect()
    }
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in tables.table(spark, sf_dir, "embeddings").collect()
    }
    pinning.unpersist_all()

    # seeds stay within their coarse cell; count matches ceil rule
    cells: dict[int, int] = {}
    seeds_by_cell: dict[int, set] = {}
    for r in assign:
        assert coarse[r["vec_id"]] == r["coarse_label"]
        assert coarse[r["sub_seed"]] == r["coarse_label"]
        cells[r["coarse_label"]] = cells.get(r["coarse_label"], 0) + 1
        seeds_by_cell.setdefault(r["coarse_label"], set()).add(r["sub_seed"])
    for cell, n in cells.items():
        assert len(seeds_by_cell[cell]) == math.ceil(n / S.IVF_TARGET_CELL)

    # nearest-seed optimality, numpy-checked on the first 50 vectors
    for r in assign[:50]:
        v = emb[r["vec_id"]]
        best = min(
            ((float(np.sum((v - emb[s]) ** 2)), s)
             for s in seeds_by_cell[r["coarse_label"]]),
        )
        # same seed modulo fp-association slack: distances via numpy
        # and via the fold expression agree to ~1e-9 relative
        got = float(np.sum((v - emb[r["sub_seed"]]) ** 2))
        assert got <= best[0] + 1e-6


def test_knn_triangles_counts_planted_triangle(spark, monkeypatch):
    """Mutual edges {0-1, 0-2, 1-2, 2-3}: one triangle, wedge count
    from degrees (2,2,3,1) = 1+1+3+0 = 5, closure = 3/5."""
    from pyspark.sql import Row

    from _kafka_streams_scaffold_spark.operators import similarity

    pairs = [(0, 1), (0, 2), (1, 2), (2, 3)]
    rows = []
    for a, b in pairs:
        rows.append(Row(vec_id=a, nbr_id=b, cosine=0.9, rank=1, is_mutual=True))
        rows.append(Row(vec_id=b, nbr_id=a, cosine=0.9, rank=1, is_mutual=True))
    # plus a non-mutual edge that must be ignored
    rows.append(Row(vec_id=3, nbr_id=0, cosine=0.5, rank=2, is_mutual=False))
    g = spark.createDataFrame(rows)
    monkeypatch.setattr(similarity, "knn_graph_query", lambda *a: g)
    out = similarity.knn_triangles_query(spark, "_").collect()[0]
    assert out["n_edges"] == 4
    assert out["n_triangles"] == 1
    assert out["n_wedges"] == 5
    assert abs(out["closure"] - 0.6) < 1e-12
