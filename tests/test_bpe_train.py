"""Hand-computed BPE training trace (operators/bpe.py)."""

from __future__ import annotations

from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import bpe


def test_bpe_train_hand_trace(spark, monkeypatch):
    """Corpus = 'abcd' x3, 'abce' x2.
    R1: ab=5 ties bc=5 -> 'a b' wins lexicographically -> merge ab.
    R2: 'ab c'=5 beats cd/ce -> abc.  R3: 'abc d'=3 -> abcd."""
    texts = ["abcd abcd abce", "abcd abce"]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    monkeypatch.setattr(bpe.tables, "table", lambda *a: df)
    rows = sorted(
        (r["round"], r["pair"], r["merged"], r["weight"])
        for r in bpe.bpe_train_query(spark, "_").collect()
    )
    assert rows == [
        (1, "a b", "ab", 5),
        (2, "ab c", "abc", 5),
        (3, "abc d", "abcd", 3),
    ]


def test_bpe_greedy_left_merge_on_runs(spark, monkeypatch):
    """'aaaa': 'a a' appears 3x per word but replace is left-to-right
    non-overlapping, so one round rewrites it to 'aa aa' (two merges),
    matching greedy BPE application."""
    df = spark.createDataFrame([Row(doc_id=0, text="aaaa aaaa b")])
    monkeypatch.setattr(bpe.tables, "table", lambda *a: df)
    rows = {r["round"]: r for r in bpe.bpe_train_query(spark, "_").collect()}
    assert rows[1]["pair"] == "a a"
    # round 2 must see 'aa aa' (weight 2 per word): merges to 'aaaa'
    assert rows[2]["pair"] == "aa aa"
    assert rows[2]["merged"] == "aaaa"
