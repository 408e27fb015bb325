"""Empty-pair domain contract for the multi-detector audits.

The DuckDB oracles for dedup_tier_agreement and blocking_recall_audit
are scalar-subquery UNIONs: they emit the FULL literal tier/strategy
domain (6 and 5 rows) even when every detector emits zero pairs. The
Spark side must match — a crossJoin against an empty mask histogram
would emit 0 rows and hash-diverge on any corpus/partition with no
near-dup pairs (the round-5 ADVICE medium finding). These tests feed
a corpus that is guaranteed pair-free and compare ROW COUNTS and
zero-valued counts against the oracle's fixed domain, not just
absence of crashes (which the degenerate sweep already covers).
"""

from __future__ import annotations

import pytest

from _kafka_streams_scaffold_spark import tables
from _kafka_streams_scaffold_spark.operators import dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def empty_documents(spark, monkeypatch):
    """Serve a schema-correct EMPTY documents table (no rows -> no
    shingles -> every detector's pair set is empty)."""
    empty = tables.table(spark, SF, "documents").limit(0).cache()
    empty.count()
    monkeypatch.setattr(tables, "table", lambda *_a, **_k: empty)
    yield
    empty.unpersist()


def test_tier_agreement_emits_full_domain_on_empty_corpus(
    spark, empty_documents
):
    rows = dedup.dedup_tier_agreement_query(spark, SF).collect()
    # 4 tiers -> C(4,2) = 6 tier pairs, all with zero counts
    assert len(rows) == 6
    pairs = {(r["tier_a"], r["tier_b"]) for r in rows}
    assert len(pairs) == 6
    for r in rows:
        assert (r["n_a"], r["n_b"], r["n_both"]) == (0, 0, 0)


def test_blocking_recall_emits_full_domain_on_empty_corpus(
    spark, empty_documents
):
    rows = dedup.blocking_recall_audit_query(spark, SF).collect()
    strategies = {r["strategy"] for r in rows}
    assert strategies == {
        "minhash",
        "simhash",
        "prefix_filter",
        "sorted_neighborhood",
        "winnowing",
    }
    for r in rows:
        assert (r["n_emitted"], r["n_true"], r["n_hit"]) == (0, 0, 0)
        assert r["recall"] is None  # undefined, mirrors oracle CASE


def test_domains_match_oracle_domains():
    """The literal domains baked into the Spark queries and the
    oracle SQL must enumerate the same tiers/strategies — a drift
    here silently un-pins the empty-corpus contract."""
    for a, b in [("simhash", "minhash")]:
        assert a in dedup.DEDUP_TIER_AGREEMENT_ORACLE
        assert b in dedup.DEDUP_TIER_AGREEMENT_ORACLE
    for name, _bit in dedup._BLOCKING_STRATEGIES:
        assert f"'{name}'" in dedup.BLOCKING_RECALL_AUDIT_ORACLE
