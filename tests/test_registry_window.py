"""Guards on the registry's driver-facing contract.

The external correctness gate hash-checks only the FIRST 50 registered
queries, so registration ORDER is part of the contract: each round the
window must carry exactly the queries that still need a driver
CORRECTNESS row (see registry._WINDOW_R06 and the module docstring's
rotation history).
"""

from __future__ import annotations

import json
import pathlib

from _kafka_streams_scaffold_spark import registry

# Green rounds available when the r06 window was frozen.
_PRIOR_ROUNDS = ("r01", "r02", "r03", "r04", "r05")

# Backlog queries deferred from the r06 window to r07 (9 light
# single-pass text/stat scans; 59 backlog, 50 slots). All are
# oracle-green locally via tools/check_oracle.py.
R07_DEFERRED = {
    "basket_triples",
    "char_entropy",
    "charset_profile",
    "phrase_search",
    "resize_payload",
    "top_session_paths",
    "transition_entropy",
    "trimmed_mean_by_type",
    "zipf_fit",
}


def _covered() -> set[str]:
    covered: set[str] = set()
    for rnd in _PRIOR_ROUNDS:
        p = pathlib.Path(f"/root/repo/CORRECTNESS_{rnd}.json")
        if p.exists():
            for name, row in json.loads(p.read_text()).items():
                if row.get("hash_match"):
                    covered.add(name)
    return covered


def test_window_is_exactly_the_r06_rotation_list():
    names = list(registry.queries())
    assert names[:50] == registry._WINDOW_R06


def test_window_queries_have_never_had_a_green_driver_row():
    """The rotation's whole point: no slot is wasted on a query that
    already has a GREEN CORRECTNESS row from rounds 1-5. (A red row
    earns the query another slot after its reshape, so the guard keys
    on hash_match, not presence.)"""
    stale = _covered() & set(registry._WINDOW_R06)
    assert not stale, f"window wastes slots on already-covered: {stale}"


def test_window_plus_deferred_covers_the_entire_backlog():
    """Every oracle-backed query that has never gone green must be
    either in the r06 window or in the explicit 9-query r07 deferral
    list — nothing silently dropped from certification."""
    backlog = set(registry.oracle_sql()) - _covered()
    missing = backlog - set(registry._WINDOW_R06) - R07_DEFERRED
    # Round-6's own additions (registered after this window froze)
    # are r07 material by construction: anything in `missing` must be
    # tracked in the NEXT ROTATION docstring. Keep the guard tight by
    # asserting that deferred+window covers all *round-5-or-earlier*
    # material; new registrations self-document via R07_MATERIAL.
    assert missing <= R07_MATERIAL, (
        f"never-certified queries untracked for rotation: "
        f"{missing - R07_MATERIAL}"
    )


# Round-6 additions registered after the r06 window froze — r07
# window material by construction. Grows during round 6 as operators
# land; mirrored in the registry module docstring's NEXT ROTATION note.
R07_MATERIAL: set[str] = {
    "priority_sample",
    "neyman_allocation",
    "dp_topk_release",
    "minhash_estimate_audit",
    "curriculum_pacing",
    "conformal_coverage_audit",
    "mmr_rerank",
    "payload_phash",
    "phash_dup_pairs",
    "linkage_entities",
    "hilbert_layout",
    "dedup_token_savings",
    "weighted_priority_sample",
    "source_dedup_matrix",
    "idle_customer_balance",
    "source_similarity_matrix",
    "ivf_probe_recall_curve",
}


def test_deferral_list_is_exactly_the_window_complement():
    """The 9 deferred queries are backlog members NOT in the window —
    if one gains a green row or enters the window, this forces the
    bookkeeping to move with it."""
    backlog = set(registry.oracle_sql()) - _covered()
    assert R07_DEFERRED == backlog - set(registry._WINDOW_R06) - R07_MATERIAL


def test_window_entries_are_oracle_backed():
    oracles = set(registry.oracle_sql())
    missing = [n for n in registry._WINDOW_R06 if n not in oracles]
    assert not missing


def test_rotated_out_families_keep_their_oracles():
    """Queries that left the window (r01-r05 green) must stay
    registered and oracle-backed so tools/check_oracle.py keeps
    verifying them locally."""
    names = set(registry.queries())
    for q in (
        "exact_dedup", "minhash_lsh_pairs", "dedup_clusters", "ann_topk",
        "power_iteration", "wordcount", "pricing_summary", "market_share",
        "corpus_keep", "tfidf_top_terms", "multimodal_features",
        "pq_codes", "scd2_history", "training_manifest", "bpe_train",
        "rfm_segments", "hapax_rate", "embedding_quantize",
        "cluster_keep_list", "ktable_latest",
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
    (posexplode rows or a deterministic join-to-string).

    Round-6 extension: top-level DECIMAL is banned too. The driver
    canonicalizes every numeric through a 9-significant-digit float
    path, which cannot carry exact cents past ~1e9 — r06's only
    driver red (`ivm_join_revenue`) was the registry's only
    DECIMAL(18,2) output at ~1e8 magnitude. The repo convention is
    exact-integer money (BIGINT cents via floor(100*x)) or DOUBLE."""
    from pyspark.sql import types as T

    bad: dict[str, list[str]] = {}
    for name, fn in registry.queries().items():
        schema = fn(spark, sf_dir).schema
        complex_cols = [
            f.name
            for f in schema.fields
            if isinstance(
                f.dataType,
                (T.ArrayType, T.MapType, T.StructType, T.DecimalType),
            )
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"complex top-level columns would break driver canon: {bad}"
