"""Guards on the registry's driver-facing contract.

The external correctness gate hash-checks only the FIRST 50 registered
queries, so registration ORDER is part of the contract: the families
that depend on that window for external verification must stay in it.
"""

from __future__ import annotations

from _kafka_streams_scaffold_spark import registry


def test_window_carries_llm_pipeline_families():
    names = list(registry.queries())
    window = set(names[:50])
    must_have = {
        # dedup tiers
        "exact_dedup", "ngram_jaccard_pairs", "minhash_lsh_pairs",
        "simhash", "simhash_pairs", "boilerplate_ngrams",
        # clustering / graph
        "dedup_clusters", "embedding_dup_clusters", "dup_pagerank",
        # similarity / ANN / quantizer
        "ann_topk", "ivf_near_dup", "ivf_assign", "ivf_ann",
        "dyn_ivf_assign", "knn_graph", "lsh_ann_recall",
        # spectral + stats + dq
        "power_iteration", "segment_spend_stats", "data_quality_audit",
    }
    missing = must_have - window
    assert not missing, f"rotated out of the correctness window: {missing}"


def test_every_query_has_oracle_or_is_documented_rows_only():
    names = set(registry.queries())
    oracles = set(registry.oracle_sql())
    rows_only = names - oracles
    # the ONLY rows-only query is the SRP-LSH search, whose quality is
    # hash-checked through lsh_ann_recall
    assert rows_only == {"lsh_ann"}


def test_oracle_keys_subset_of_queries():
    assert set(registry.oracle_sql()) <= set(registry.queries())
