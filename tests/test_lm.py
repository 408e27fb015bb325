"""Tests for the corpus language-model curation tier (operators/lm.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import lm


def _docs(spark, rows):
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, source=s, n_chars=len(t))
            for i, (t, s) in enumerate(rows)
        ]
    )


def test_unigram_surprisal_hand_computed(spark, monkeypatch):
    # corpus: a a a b -> p(a)=3/4, p(b)=1/4
    df = _docs(spark, [("a a a", "s0"), ("b", "s0")])
    monkeypatch.setattr(lm.tables, "table", lambda *a: df)
    rows = {r["doc_id"]: r for r in lm.unigram_lm_score_query(spark, "_").collect()}
    # doc 0: 3 tokens of 'a', surprisal ln(4/3) each
    s_a = math.floor(1e6 * math.log(4.0 / 3.0)) / 1e6
    assert rows[0]["n_tokens"] == 3
    assert rows[0]["avg_surprisal"] == pytest.approx(s_a, abs=1e-9)
    # doc 1: 1 token of 'b', surprisal ln(4)
    s_b = math.floor(1e6 * math.log(4.0)) / 1e6
    assert rows[1]["avg_surprisal"] == pytest.approx(s_b, abs=1e-9)
    # rarer token ==> strictly more surprising
    assert rows[1]["avg_surprisal"] > rows[0]["avg_surprisal"]


def test_kl_zero_when_source_matches_corpus(spark, monkeypatch):
    # every source has the corpus distribution -> each KL is exactly 0
    # in fixed-point (every ln ratio argument is 1.0).
    df = _docs(spark, [("x x y", "s0"), ("x x y", "s1"), ("x x y", "s2")])
    monkeypatch.setattr(lm.tables, "table", lambda *a: df)
    rows = {r["source"]: r for r in lm.source_kl_divergence_query(spark, "_").collect()}
    for s in ("s0", "s1", "s2"):
        assert rows[s]["kl_nats"] == pytest.approx(0.0, abs=2e-6)
        assert rows[s]["n_tokens"] == 3


def test_kl_hand_computed_for_shifted_source(spark, monkeypatch):
    # corpus: x y z (uniform). s0 = {x,y}, s1 = {z}.
    # KL(s0) = 2 * (1/2) ln((1/2)/(1/3)) = ln(3/2); KL(s1) = ln(3).
    df = _docs(spark, [("x y", "s0"), ("z", "s1")])
    monkeypatch.setattr(lm.tables, "table", lambda *a: df)
    rows = {r["source"]: r for r in lm.source_kl_divergence_query(spark, "_").collect()}
    assert rows["s0"]["kl_nats"] == pytest.approx(math.log(1.5), abs=2e-6)
    assert rows["s1"]["kl_nats"] == pytest.approx(math.log(3.0), abs=2e-6)


def test_weighted_sample_monotone_and_content_stable(spark, monkeypatch):
    long_text = "w " * 400
    df = _docs(spark, [("tiny", "s0"), (long_text, "s0")] * 1)
    monkeypatch.setattr(lm.tables, "table", lambda *a: df)
    out = lm.quality_weighted_sample_query(spark, "_").collect()
    pcts = {r["doc_id"]: r["keep_pct"] for r in out}
    # the long doc hits the cap; the short doc sits at the floor
    for r in out:
        if r["doc_id"] == 1:
            assert r["keep_pct"] == lm.MAX_KEEP_PCT
        if r["doc_id"] == 0:
            assert r["keep_pct"] == lm.MIN_KEEP_PCT
    # rerunning with different parallelism yields the identical keep set
    again = lm.quality_weighted_sample_query(
        spark, "_"
    ).repartition(7).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}
