"""Central query registry: every implemented operator from SURVEY.md §2
(plus the beyond-reference training-data ops) gets

- a ``queries()`` entry: ``name -> (spark, sf_dir) -> DataFrame``
- where SQL-expressible, an ``oracle_sql()`` entry: equivalent DuckDB
  SQL over the same parquet tables (views pre-registered by the driver).

Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing values.

REGISTRATION ORDER IS LOAD-BEARING: the driver's correctness gate
hash-checks the FIRST 50 registered queries each round, so the window
rotates each round toward queries that have never had a driver
CORRECTNESS row. Rotation history:

- r03 window: the LLM-data-pipeline tier (dedup, clustering,
  similarity/ANN, spectral, stats, sketches, dq, curation, textops,
  multimodal) — all 50 green in CORRECTNESS_r03.
- r04 window (``_WINDOW_R04`` below): the round-3 additions (pq_*
  family, temporal/CDC, kcore, BPE, feature/stats/dq additions,
  capstones, agreement matrix) plus the round-4 scale forms
  (token_budget_selection_2p, equi_depth_histogram_2p,
  snapshot_diff_full) and the older judge-only queries — everything
  green in r01-r03 rotates out and keeps tools/check_oracle.py +
  pytest coverage.

- r05 window (``_WINDOW_R05`` below): the COMPLETE 42-query
  certification backlog (every round-4 addition, the older
  judge-only tier, segment_trend, and embedding_quantize — reshaped
  from ``array<int>`` to a csv string after its r04 canonicalizer
  red) plus the eight round-5 additions (lexstats + segmentation
  families). All 50 went GREEN in CORRECTNESS_r05.

- r06 window (``_WINDOW_R06`` below): 50 of the 59-query round-5
  late-addition backlog (registered after the r05 window froze),
  prioritizing the heavier families per the r5 verdict: KN/bigram
  LM, LOF/label-purity, FS linkage, blocking-recall audit,
  int8/binary/matryoshka ANN + recall gates, privacy audits,
  graph-structure audits. The 9 deferred to r07 (light single-pass
  text/stat scans, all oracle-green locally): basket_triples,
  char_entropy, charset_profile, phrase_search, resize_payload,
  top_session_paths, transition_entropy, trimmed_mean_by_type,
  zipf_fit.

- r07 window (``_WINDOW_R07`` below): the full 28-slot mandate from
  the r06 verdict — the 9 deferred light queries, the 17 round-6
  additions, and 2 re-certifications (ivm_join_revenue after its
  DECIMAL->BIGINT-cents output fix; dedup_tier_agreement after its
  empty-pair left-join fix) — plus the 22 round-7 additions
  (retrieval tier: ann_hubness_audit, kcenter_coreset,
  maxsim_late_interaction, rocchio_expansion; drift tier:
  ks_drift_audit, mmd_label_drift, ab_proportion_test,
  simpson_reversal_audit, jl_projection_audit; stats/sketch:
  theil_sen_trend, nelson_aalen_hazard, runs_test_randomness,
  ams_f2_estimate, poisson_dispersion_audit, dp_clipped_mean;
  text:
  collocation_pmi, chao1_vocab_estimate; sampling:
  group_kfold_split; layout: layout_locality_audit, bucket_plan;
  dedup/sessions: dedup_representative_stats, session_concurrency).
  Exactly 50 — no backlog deferred this round.

- r08 window (``_WINDOW_R08`` below): no certification backlog existed
  at the r07 freeze (CORRECTNESS_r07 went 50/50 green), so the window
  is exactly 50 = (a) the 7 post-freeze round-7 additions tracked as
  R08_MATERIAL (facility_location_coreset, detector_mcnemar,
  rank_biased_overlap, label_purity_null_baseline, gate_ordering_plan,
  waterfill_allocation, salt_factor_plan), (b) 4 re-certifications for
  queries whose implementation changed in round 8 (kcenter_coreset's
  fold-form self-dot, group_kfold_split/ams_f2_estimate's mod-2^31
  hash pre-reduction — all ADVICE fixes — and session_concurrency's
  segment-builder factoring for its streaming twin), and (c) the 39
  round-8 additions: the nonparametric-inference tier, BH-FDR,
  quantile normalization, the embedding-geometry tier (anisotropy,
  Two-NN id, MRR, silhouette, centroid drift, PCA), the dedup/span
  tier (multi-width spans, threshold sweeps, semantic keep,
  capture-recapture, novelty decay), and the governance/selection
  tier (HHI, LOO sensitivity, skyline, SRM, uniformity, temperature
  mix, Hoeffding planner, clustering depth, local clustering
  coefficient). ``_apply_window`` allows <=50 mid-round; the final
  freeze landed at exactly 50.

- r09 window (``_WINDOW_R09`` below): CORRECTNESS_r08 went 50/50
  green, so the window is the 37-query R09_MATERIAL backlog (round-8
  additions registered after the r08 freeze; all bit-exact in the
  local sweep at BOTH sf0.01 and sf0.1 — SCALE.md cross-SF
  certification record) + up to 13 slots for round-9 changed-impl
  re-certifications, added as changes land. ``small_qty_revenue`` is
  in the window as the mandated re-certification of the CHANGED
  implementation (trade.py Q17 analog; the shadowed subqueries.py
  variant was deleted this round and register() now raises on
  duplicates). ``detector_cochran_q`` is placed LAST in the window
  so the dedup-audit keep-scope chain stays consecutive:
  _apply_window puts _DEDUP_AUDIT_CHAIN immediately after the
  window, giving ... detector_cochran_q | dedup_tier_agreement ...

- r10 window (``_WINDOW_R10`` below): CORRECTNESS_r09 went 50/50
  green, clearing the backlog, so the window is exactly 50 = (a) the
  7 R10_MATERIAL round-9 post-freeze additions, (b) the 17 stale
  certifications flagged by ``tools/stale_cert_audit.py`` (the
  round-10 automation of the r08 small_qty_revenue lesson: a green
  row whose implementing function or oracle changed in a LATER
  commit is no longer a certification — the audit diffs the exact
  source segments through git history; knn_graph/knn_triangles/
  containment_pairs were named in round 5's re-cert pool note below
  but no window ever carried them), (c) the 6 queries whose physical
  plan changed through the round-10 ``_tier_pairs`` shared-pin hoist
  without their own function changing (the audit's documented
  helper-change blind spot, covered manually: dedup_tier_agreement,
  dedup_token_savings, detector_mcnemar, dup_capture_recapture,
  detector_cochran_q, kendall_w_detectors), and (d) 20 age-based
  re-validations — the oldest still-standing green rows (all r02),
  oldest first per the r09 verdict. The dedup-audit chain members
  sit LAST (consecutive, ``dedup_tier_agreement`` first; the exact
  tail order need not match the ``_DEDUP_AUDIT_CHAIN`` constant) so
  the family block (window tail + the one appended non-window
  member) stays consecutive for the shared tier-pair pins.

- r11 window (``_WINDOW_R11`` below): CORRECTNESS_r10 went 50/50
  green and the round-11 ``stale_cert_audit`` run (after its ROUNDS
  glob fix — the r10 verdict's #1 ask) flagged ZERO stale
  certifications, so the window is exactly 50 = (a) the 5
  R11_MATERIAL round-10 post-freeze additions
  (kruskal_wallis_sources, brown_forsythe_lengths,
  page_hinkley_drift, friedman_event_mix, wilcoxon_signed_rank),
  (b) the 2 round-11 codec additions (codec_moments, codec_audit —
  the real synthetic TIMG/TAUD decoder replacing the multimodal
  ``decode="real"`` stub, r10 verdict ask #5), and (c) 43 age-based
  re-validations: ALL 27 remaining r02-green rows plus the 16
  alphabetically-first r03-green rows (text/dedup/ANN tier),
  oldest round first. No chain member is in the window, so
  ``_apply_window`` appends the whole dedup-audit family
  immediately after slot 50 in constant order.

- r12 window (``_WINDOW_R12`` below): CORRECTNESS_r11 went 50/50
  green, so the window is the 13 R12_MATERIAL round-11 post-freeze
  additions (the complete never-certified backlog) + 37 re-certs
  chosen by the r11 verdict's ask #2 (plan-changed-in-r11 but not
  driver-certified: the three iteration folds, the kNN/PQ ladders,
  the curation/BPE and multimodal pins) and this round's own touches
  (CC contraction -> the whole doc-graph family + linkage; the
  shared-pinned strategy pair sets + both audits). Families sit in
  the window as consecutive blocks; the embedding fragment is LAST so
  ``_apply_window`` (which now appends ``_EMB_CHAIN`` first)
  continues it across the boundary. The dedup audit+pairs family is
  deliberately SPLIT: an 8-slot certified fragment in-window, the
  other 14 members as their own consecutive block after the window —
  one extra cold pin build per bench run instead of 22 window slots.

NEXT ROTATION (round 13): no post-freeze additions exist this round
(optimization rounds add no queries — R13_MATERIAL is empty), so the
window is free for any r12 reds, the stale set from a fresh
``tools/stale_cert_audit.py`` run, manual re-certs for helper-level
changes the audit cannot see, and age-based fills (oldest green rows
first: the remaining r03 rows, label_centroids onward
alphabetically) up to 50. The r12-uncertified embedding-chain
members that r11 changed but this window could not fit
(pq_ann_rerank, ann_rank_fusion, mrr_audit, the recall ladder,
dyn_ivf_assign, adamic_adar_links, local_clustering_coeff,
ann_hubness_audit, label_purity_null_baseline, twonn_intrinsic_dim,
ivf_assign and the cell audits) are the highest-value re-cert picks.
Update tests/test_registry_window.py in the same commit as the
freeze.

PREVIOUS ROTATION NOTE (round 6, kept for the audit trail): the
round-5 late additions
registered after the r05 window was frozen (sequence_gap_audit,
watermark_lag_audit, bigram_next_token, compaction_plan,
join_key_skew, int8_ann, int8_ann_recall, prefix_filter_pairs,
matryoshka_recall, cluster_cohesion, budget_allocation,
winnowing_fingerprints, split_leakage_audit, epoch_interleave,
char_entropy, l_diversity_audit, source_modularity,
degree_assortativity, sorted_neighborhood_pairs,
blocking_recall_audit, join_size_estimate, t_closeness_audit,
resize_payload, systematic_weighted_sample,
trimmed_mean_by_type, phrase_search, winnowing_pairs,
bigram_lm_score, transition_entropy, binary_signatures,
binary_ann, binary_ann_recall, kneser_ney_bigram,
knn_lof_outliers, knn_label_purity, dp_laplace_counts,
mutual_information, ivm_join_revenue, quantized_ann_ndcg,
hll_rolling_distinct, charset_profile, bootstrap_se,
dsir_importance, fs_linkage_scores, calibration_audit,
hll_distinct_rollup, basket_triples, zipf_fit,
nb_lang_confusion, pii_redact, km_user_survival,
zone_map_skip_audit, source_ablation,
rendezvous_reshard_audit, top_session_paths, batch_mix_audit,
fd_audit, detector_kappa, ht_estimate_audit) plus
round-6's own additions; fill the remaining slots with whichever
certified queries changed implementation since their green row
(re-certification beats re-running never-changed queries — in round
5 that was ngram_jaccard_pairs, containment_pairs,
dedup_tier_agreement, dedup_clusters, embedding_dup_clusters,
cluster_keep_list, dup_pagerank (shared-pin / bitmask / active-set
refactors) and kcore (broadcast-peel loop), all changed after their
r04 green rows; late in round 5 knn_graph and knn_triangles changed
too — their edge blocking moved from coarse IVF cells to the dynamic
sub-quantizer after the 10x probe exposed the coarse-cell join as a
hidden quadratic (145x at 10x; now ~1.3x) — so both join the
re-certification pool; all oracle checks pass but a driver row
re-certifies). Update tests/test_registry_window.py in the same
commit.

The window is applied as an explicit reorder (``_WINDOW_R07``) after
all register() calls, so the family grouping of the code below never
has to move and every rotation is a reviewable list diff.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(
    name: str, fn: QueryFn, oracle: str | None = None, *, replace: bool = False
) -> None:
    """Register a query (and optionally its DuckDB oracle) under ``name``.

    Duplicate names RAISE: last-write-wins silently shadowed the
    long-certified ``small_qty_revenue`` in round 8 (two different Q17
    variants under one name — historical CORRECTNESS/bench rows then
    referred to a different computation). Pass ``replace=True`` only
    for a deliberate, documented re-registration.
    """
    if name in _QUERIES and not replace:
        raise ValueError(
            f"duplicate query registration {name!r}; pass replace=True "
            "for a deliberate re-registration"
        )
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False

# Driver correctness window for round 10 (slots 0..49) — see module
# docstring: 7 R10_MATERIAL + 17 stale-cert-audit flags + 6 manual
# helper-change re-certs + 20 age-based re-validations, grouped by
# family so janino/codegen first-touch amortizes across neighbors.
_WINDOW_R10 = [
    # lexical / text tier (material + stale textops)
    "tail_token_share",
    "log_odds_terms",
    "lexicon_gate_audit",
    "tfidf_top_terms",
    "vocab_coverage",
    # stats / data-quality tier
    "weighted_median_price",
    "correlation_matrix",
    "event_anomalies",
    "benford_audit",
    "referential_integrity",
    # sales / events analytics re-validation (oldest green rows, r02)
    "active_rich_customers",
    "asof_prev_purchase",
    "click_no_purchase_days",
    "customer_balance_quartiles",
    "customers_with_open_orders",
    "customers_without_orders",
    "error_and_signup_days",
    "events_hopping",
    "events_hourly",
    "events_pivot",
    "events_unpivot",
    "funnel_conversion",
    "json_enrich",
    "json_props_stats",
    # TPC-H analog tier (stale + oldest green rows)
    "bulk_part_suppliers",
    "brand_disjunction_revenue",
    "cust_order_counts",
    "idle_rich_customers",
    "min_cost_supplier",
    "important_part_values",
    "large_volume_customers",
    "late_order_priority",
    # multimodal
    "multimodal_features",
    # embedding / graph tier
    "v_measure_cells",
    "recall_at_k_curve",
    "participation_ratio",
    "pca_top_component",
    "knn_graph",
    "knn_triangles",
    "kcore",
    # dedup tier
    "containment_pairs",
    # dedup-audit chain members — LAST, consecutive, and with
    # dedup_tier_agreement first on purpose (the exact tail order
    # need not match _DEDUP_AUDIT_CHAIN's constant order; the tests
    # require only consecutiveness and the first member):
    # _apply_window appends the remaining chain member
    # (minhash_estimate_audit) immediately after the window, so the
    # whole family is one consecutive shared-pin block
    "dedup_tier_agreement",
    "dedup_token_savings",
    "source_dedup_matrix",
    "blocking_recall_audit",
    "detector_kappa",
    "detector_mcnemar",
    "dup_capture_recapture",
    "detector_cochran_q",
    "kendall_w_detectors",
]

# Driver correctness window for round 11 (slots 0..49) — see module
# docstring: 5 R11_MATERIAL + 2 codec additions + 43 age-based
# re-validations (all 27 remaining r02 rows + 16 oldest r03 rows),
# grouped by family so janino/codegen first-touch amortizes across
# neighbors. Zero stale-audit flags this round (the audit now globs
# CORRECTNESS_r*.json, so the r10 rows count).
_WINDOW_R12 = [
    # --- never-certified backlog: the 13 R12_MATERIAL round-11
    # post-freeze additions (nonparametric/association ladder + the
    # two dedup-audit chain members listed in the dedup block below)
    "mood_median_test",
    "cliffs_delta_sources",
    "jonckheere_trend",
    "durbin_watson_daily",
    "ad_ksample_sources",
    "dunn_posthoc_sources",
    "ansari_bradley_halves",
    "cmh_event_value",
    "somers_d_priority",
    "welch_anova_sources",
    "quade_event_mix",
    # --- r11-optimization re-certs: the three iteration-to-fold
    # rewrites had no driver row on their new plans (r11 verdict ask
    # #2 — top priority of this rotation)
    "markov_stationary",
    "power_iteration",
    "pca_top_component",
    # --- multimodal family, whole (r11 mm.phash shared pins; the
    # family is 3 slots so it certifies as one consecutive block)
    "payload_phash",
    "phash_dup_pairs",
    "phash_threshold_sweep",
    # --- curation/BPE family, whole + corpus_keep (r11 cur./bpe.
    # pins + the round-12 thread-pooled gate builds; corpus_keep
    # directly before corpus_keep_full also fixes the r11 layout
    # where corpus_keep built cur.keep in a far-away slot and the
    # chain rebuilt it)
    "corpus_keep",
    "corpus_keep_full",
    "bpe_train",
    "bpe_encode",
    "bpe_doc_tokens",
    "training_manifest",
    # --- SimHash doc-graph family, whole (round-12 CC contraction +
    # lazy-checkpoint PageRank rounds touch every member's shared
    # roots)
    "dedup_clusters",
    "dup_pagerank",
    "dedup_representative_stats",
    "contrastive_collision",
    "cluster_keep_list",
    "dup_graph_degrees",
    "kcore",
    "source_modularity",
    "degree_assortativity",
    # --- dedup audit/pairs fragment: the two R12_MATERIAL chain
    # members, the two round-12-touched audits, linkage (CC engine
    # change) and the three newly shared-pinned strategy pair sets.
    # The fragment runs consecutively here; the remaining 14 family
    # members run as their own consecutive block after the window
    # (one extra cold pin build per bench run — the price of
    # certifying these eight without spending 22 slots)
    "dedup_tier_agreement",
    "blocking_recall_audit",
    "fleiss_kappa_detectors",
    "lsh_param_plan",
    "linkage_entities",
    "prefix_filter_pairs",
    "sorted_neighborhood_pairs",
    "winnowing_pairs",
    # --- embedding/ANN fragment, LAST on purpose: _apply_window
    # appends the rest of _EMB_CHAIN immediately after the window, so
    # the family runs back-to-back across the boundary and the sim.*
    # pins build once (the r11 dedup_clusters/dup_pagerank straddle
    # pattern, moved to the costlier family). Members chosen per the
    # r11 verdict: the kNN ladder, the PQ ladder, and the near-dup/CC
    # tier — r11 plan changes without driver rows
    "knn_graph",
    "knn_triangles",
    "knn_lof_outliers",
    "knn_label_purity",
    "pq_codes",
    "pq_ann",
    "pq_recall",
    "ivf_near_dup",
    "embedding_dup_clusters",
    "semantic_dedup_keep",
]

_WINDOW_R11 = [
    # inference / drift tier (R11_MATERIAL)
    "kruskal_wallis_sources",
    "brown_forsythe_lengths",
    "friedman_event_mix",
    "wilcoxon_signed_rank",
    "page_hinkley_drift",
    # codec tier (round-11 additions)
    "codec_moments",
    "codec_audit",
    # parity / events re-validation (r02 rows)
    "uppercase",
    "wordcount",
    "wordcount_point_lookup",
    "purchases_agg",
    "purchases_range_scan",
    "user_event_type_sets",
    "user_sessions",
    "retention_cohorts",
    "rolling_user_value",
    "revenue_forecast",
    # TPC-H analog / sales re-validation (r02 rows)
    "latest_shipper_counts",
    "local_supplier_revenue",
    "market_share",
    "pricing_summary",
    "product_profit",
    "promo_revenue",
    "returned_items_top_customers",
    "revenue_cube",
    "revenue_grouping_sets",
    "revenue_rollup",
    "shipping_priority",
    "shipping_speed_priority",
    "supplier_part_variety",
    "top_orders_per_customer",
    "top_revenue_supplier",
    "top_value_parts",
    "volume_shipping",
    # text / dedup / ANN tier re-validation (oldest r03 rows)
    "ann_topk",
    "approx_distinct_users",
    "approx_percentiles",
    "bm25_search",
    "boilerplate_ngrams",
    "bpe_merge_candidates",
    "chunk_packing",
    "clean_text",
    "corpus_keep",
    "data_quality_audit",
    "distinct_users_daily",
    "doc_chunks",
    "doc_fingerprint",
    "doc_repetition",
    # LAST two on purpose (round-11 optimization): both are members
    # of the SimHash doc-graph family, and _apply_window places
    # _GRAPH_CHAIN immediately after the window — so the family runs
    # back-to-back across the window boundary and the graph.* shared
    # pins (edge list, undirected table, CC labels, PageRank vector)
    # build once for all nine members. Window MEMBERSHIP is unchanged
    # from the freeze; only the order inside the 50 moved, which the
    # driver's prefix gate does not care about.
    "dedup_clusters",
    "dup_pagerank",
]

# Round-11 optimization chains (the dedup-audit keep-scope pattern
# generalized): each list is a family of registered queries that
# derive from the same shared_pin roots, kept CONSECUTIVE in registry
# order so bench.py can hold the family's pins warm across the block.
# Membership was measured, not guessed: tools-instrumented shared_pin
# key tracking over every registered query (see OPTIMIZATION_r11.md).

# SimHash doc-graph family (graph.* pins) — continues the window's
# dedup_clusters / dup_pagerank tail.
_GRAPH_CHAIN = [
    "dedup_representative_stats",
    "contrastive_collision",
    "cluster_keep_list",
    "dup_graph_degrees",
    "kcore",
    "source_modularity",
    "degree_assortativity",
]

# Second-tier dedup.* consumers (pair detectors and linkage outside
# the audit chain): they read the same shingle/signature/candidate
# pins the audit family builds, so they run as a continuation of that
# block under the same "dedup." keep-scope.
_DEDUP_PAIRS_CHAIN = [
    "minhash_lsh_pairs",
    "edit_distance_pairs",
    "fs_linkage_scores",
    "linkage_entities",
    "containment_pairs",
    "ngram_jaccard_pairs",
    "split_leakage_audit",
    "sorted_neighborhood_pairs",
    "prefix_filter_pairs",
    "winnowing_pairs",
]

# Curation / BPE family (cur.* / bpe.* pins): the keep-gate
# compositions and the trained-tokenizer artifact. corpus_keep itself
# sits in the r11 window; corpus_keep_full rebuilds the cur.keep pin
# inside its own slot.
_CUR_CHAIN = [
    "corpus_keep_full",
    "bpe_train",
    "bpe_encode",
    "bpe_doc_tokens",
    "training_manifest",
]

# Multimodal perceptual-hash family (mm.* pins): the fingerprint
# table feeds the pair detector (both posting sides) and the
# threshold sweep. codec_moments / codec_audit share the mm.payload
# encode pin too, but they sit ADJACENT in the r11 window (slots
# 5-6), so bench.py's family set covers them there.
_MM_CHAIN = [
    "payload_phash",
    "phash_dup_pairs",
    "phash_threshold_sweep",
]

# Embedding / ANN family (sim.* pins): quantizer assignment, exact
# top-k reference, kNN edge list, PQ codebook/ADC, near-dup pairs and
# the embedding CC labels. ann_topk itself sits in the r11 window, so
# its pin rebuilds once inside this block (first consumer).
_EMB_CHAIN = [
    # coarse-assignment consumers (sim.assign builds here)
    "ivf_assign",
    "embedding_outliers",
    "ncc_confusion",
    "cell_label_gini",
    "v_measure_cells",
    # IVF search + audits (sim.ann_topk builds at first consumer)
    "ivf_ann",
    "ivf_probe_recall_curve",
    "mrr_audit",
    # recall ladder over the exact reference
    "lsh_ann_recall",
    "lsh_multiprobe_recall",
    "matryoshka_recall",
    "recall_at_k_curve",
    "int8_ann_recall",
    "binary_ann_recall",
    "quantized_ann_ndcg",
    "rank_biased_overlap",
    # PQ tier (sim.pq_codebook / sim.pq_adc build here)
    "pq_codes",
    "pq_ann",
    "pq_ann_rerank",
    "pq_recall",
    "ann_rank_fusion",
    # dynamic sub-quantizer + kNN graph tier (sim.dyn_assign /
    # sim.knn_edges build here)
    "dyn_ivf_assign",
    "knn_graph",
    "knn_triangles",
    "knn_lof_outliers",
    "knn_label_purity",
    "adamic_adar_links",
    "local_clustering_coeff",
    "ann_hubness_audit",
    "label_purity_null_baseline",
    "twonn_intrinsic_dim",
    # near-dup pairs + embedding CC (sim.near_dup_edges / sim.emb_cc)
    "ivf_near_dup",
    "embedding_dup_clusters",
    "semantic_dedup_keep",
]

# r09 window kept for the rotation-history tests (50/50 green in
# CORRECTNESS_r09). Was: the complete 37-query never-certified backlog
# (R09_MATERIAL), grouped by family so janino/codegen first-touch
# amortized across neighbors, + the mandated small_qty_revenue
# re-certification.
_WINDOW_R09 = [
    # experimentation / drift tier
    "js_source_drift",
    "psi_drift_score",
    "cuped_uplift",
    "did_uplift",
    "sprt_daily_decision",
    "smd_balance_audit",
    "qq_shift_profile",
    # lexical / LM tier
    "good_turing_unseen",
    "burrows_delta",
    "token_entropy",
    "hill_tail_index",
    # time-series / trend tier
    "interarrival_burstiness",
    "theil_sen_ci",
    "cross_correlation_lags",
    "binseg_changepoints",
    "markov_stationary",
    # survival / queueing tier
    "logrank_cohorts",
    "littles_law_audit",
    # planning tier
    "gate_ordering_cost_plan",
    "nzv_dimension_audit",
    # sales analytics / TPC-H analog completions (small_qty_revenue is
    # the mandated changed-impl re-certification — trade.py Q17)
    "cust_order_dist",
    "promo_revenue_share",
    "small_qty_revenue",
    "branded_basket_revenue",
    "discount_elasticity",
    "revenue_attribution",
    "lorenz_curve_points",
    "new_vs_returning_daily",
    "audience_overlap",
    "activity_streaks",
    "fulfillment_lag",
    # embedding / cluster-quality tier
    "davies_bouldin",
    "cell_label_gini",
    "contrastive_collision",
    "ncc_confusion",
    "adamic_adar_links",
    # detector tier — LAST on purpose: _apply_window places
    # _DEDUP_AUDIT_CHAIN immediately after the window, so the shared
    # dedup-tier pins stay adjacent (r6 verdict's triple-pay fix)
    "detector_cochran_q",
]

# r08 window kept for the rotation-history tests (50/50 green in
# CORRECTNESS_r08). Was: the 7 R08_MATERIAL queries + 4 changed-impl
# re-certifications + the 39 round-8 additions, grouped by family so
# janino/codegen first-touch amortized across neighbors.
_WINDOW_R08 = [
    # retrieval / ranking tier (r7 post-freeze material)
    "facility_location_coreset",
    "rank_biased_overlap",
    # detector / label audits
    "detector_mcnemar",
    "label_purity_null_baseline",
    # planning tier
    "gate_ordering_plan",
    "waterfill_allocation",
    "salt_factor_plan",
    # re-certifications: implementation changed after the green r07
    # row (round-8 ADVICE fixes — kcenter's fold-form self-dot, the
    # mod-2^31 pre-reduction in the kfold/AMS hash arithmetic)
    "kcenter_coreset",
    "group_kfold_split",
    "ams_f2_estimate",
    # round-8 additions: nonparametric inference tier
    "mann_whitney_audit",
    "kendall_tau_trend",
    "spearman_trend",
    "cvm_drift_audit",
    "pettitt_changepoint",
    "wilson_ci_segments",
    "eb_rate_shrinkage",
    "cramers_v_association",
    "hodges_lehmann_shift",
    "source_concentration_audit",
    # round-8 additions: embedding-geometry tier
    "embedding_anisotropy_audit",
    "twonn_intrinsic_dim",
    "mrr_audit",
    # round-8 additions: dedup / span tier
    "multiwidth_span_profile",
    "simhash_threshold_sweep",
    "semantic_dedup_keep",
    # round-8 additions: layout / mixture / graph tier
    "clustering_depth_audit",
    "sqrt_temperature_mix",
    "local_clustering_coeff",
    # round-8 additions: calibration / multiple-testing / time-series
    "quantile_normalize_map",
    "bh_fdr_drift_gates",
    "ljung_box_stat",
    # re-certification: segment builder factored out for the streaming
    # twin (session_day_segments) — plan-identical, but touched
    "session_concurrency",
    # round-8 additions: trend/governance/selection tier
    "mann_kendall_trend",
    "dup_capture_recapture",
    "loo_source_sensitivity",
    "skyline_quality_length",
    "split_srm_check",
    "welch_t_audit",
    "cochran_armitage_trend",
    "phash_threshold_sweep",
    "pca_top_component",
    "hash_bucket_uniformity",
    "ivf_margin_audit",
    "novelty_decay_curve",
    "anova_source_lengths",
    "simplified_silhouette",
    "centroid_shift_drift",
    "sample_size_epsilon_plan",
    "label_anisotropy_audit",
]

# The dedup-audit family must stay CONSECUTIVE in registration order
# for bench.py's keep-scope pin sharing (the r6 verdict's triple-pay
# fix: consecutive members read the first member's dedup.* shared-pin
# materializations; measured 29% family reduction). In r07 the window
# itself provided the adjacency; with those queries rotated out of
# _WINDOW_R08, _apply_window now places this chain immediately AFTER
# the window (slots 50+, outside the driver's hash-checked prefix).
_DEDUP_AUDIT_CHAIN = [
    "dedup_tier_agreement",
    "dedup_token_savings",
    "source_dedup_matrix",
    "minhash_estimate_audit",
    "blocking_recall_audit",
    "detector_kappa",
    # In the r09 window (placed LAST there); listed here for family
    # documentation — _apply_window skips names already in the window,
    # so the remaining members land immediately after it: the window
    # tail plus this chain form one consecutive shared-pin run.
    "detector_cochran_q",
    # round-9 addition (R10 material) riding the same shared tier
    # pins; placed in the chain so its four detector derivations read
    # the family's warm materializations in bench order
    "kendall_w_detectors",
    # round-10 additions to the family: both consume the shared
    # per-tier pair pins (_tier_pairs is itself a shared pin as of
    # round 10), so they belong in the consecutive keep-scope block
    "detector_mcnemar",
    "dup_capture_recapture",
    # round-11 post-freeze addition: Fleiss' kappa reads the same
    # four tier-pair pins, so it joins the consecutive keep-scope
    # block (last — every earlier member's pins stay warm for it)
    "fleiss_kappa_detectors",
    # round-11 post-freeze addition: the banding planner reads the
    # shared minhash-signature pin, so it rides the block too
    "lsh_param_plan",
]

# r07 window kept for the rotation-history tests (50/50 green in
# CORRECTNESS_r07). Was exactly: the 9 queries deferred from the r06
# window + the 17 round-6 additions + 2 re-certifications
# (ivm_join_revenue, dedup_tier_agreement) + the 22 round-7 additions.
_WINDOW_R07 = [
    # text / lexical tier (deferred lights + round-7 additions)
    "collocation_pmi",
    "chao1_vocab_estimate",
    "char_entropy",
    "transition_entropy",
    "charset_profile",
    "phrase_search",
    "zipf_fit",
    "top_session_paths",
    "basket_triples",
    "trimmed_mean_by_type",
    "resize_payload",
    # embedding / retrieval tier
    "ann_hubness_audit",
    "kcenter_coreset",
    "maxsim_late_interaction",
    "rocchio_expansion",
    "mmr_rerank",
    "ivf_probe_recall_curve",
    "jl_projection_audit",
    "mmd_label_drift",
    # multimodal fingerprints
    "payload_phash",
    "phash_dup_pairs",
    # dedup / linkage ROI tier
    # order inside this family is load-bearing for bench.py's
    # keep-scope pin sharing: the dedup.* shared roots survive only
    # across CONSECUTIVE family members, so the outsider
    # (source_similarity_matrix, a textops query) runs after
    # minhash_estimate_audit rather than splitting the chain
    "dedup_tier_agreement",
    "dedup_token_savings",
    "source_dedup_matrix",
    "minhash_estimate_audit",
    "source_similarity_matrix",
    "dedup_representative_stats",
    "linkage_entities",
    # sampling / privacy tier
    "priority_sample",
    "weighted_priority_sample",
    "neyman_allocation",
    "group_kfold_split",
    "curriculum_pacing",
    "conformal_coverage_audit",
    "dp_topk_release",
    "dp_clipped_mean",
    # statistics / estimation tier
    "theil_sen_trend",
    "nelson_aalen_hazard",
    "runs_test_randomness",
    "ab_proportion_test",
    "simpson_reversal_audit",
    "ks_drift_audit",
    "ams_f2_estimate",
    "poisson_dispersion_audit",
    # layout / sessions
    "hilbert_layout",
    "layout_locality_audit",
    "bucket_plan",
    "session_concurrency",
    # relational / IVM
    "idle_customer_balance",
    "ivm_join_revenue",
]

# r06 window kept for the rotation-history tests (49 of 50 went green
# in CORRECTNESS_r06; ivm_join_revenue re-certifies in r07).
_WINDOW_R06 = [
    # LM / tokenizer tier (heaviest janino shapes first-touch here)
    "kneser_ney_bigram",
    "bigram_lm_score",
    "bigram_next_token",
    "dsir_importance",
    "mutual_information",
    # ANN quantization tiers + recall/quality gates
    "int8_ann",
    "int8_ann_recall",
    "binary_signatures",
    "binary_ann",
    "binary_ann_recall",
    "matryoshka_recall",
    "quantized_ann_ndcg",
    # kNN-graph analytics
    "knn_lof_outliers",
    "knn_label_purity",
    "cluster_cohesion",
    # record linkage + blocking strategies + their recall audit
    "fs_linkage_scores",
    "prefix_filter_pairs",
    "sorted_neighborhood_pairs",
    "winnowing_fingerprints",
    "winnowing_pairs",
    "blocking_recall_audit",
    "detector_kappa",
    # graph-structure audits
    "source_modularity",
    "degree_assortativity",
    # privacy tier
    "l_diversity_audit",
    "t_closeness_audit",
    "dp_laplace_counts",
    "pii_redact",
    # sketches: rolling / rollup HLL
    "hll_rolling_distinct",
    "hll_distinct_rollup",
    # sampling / estimation / statistics
    "systematic_weighted_sample",
    "ht_estimate_audit",
    "bootstrap_se",
    "km_user_survival",
    "calibration_audit",
    "nb_lang_confusion",
    # streaming-adjacent event-time audits
    "sequence_gap_audit",
    "watermark_lag_audit",
    # layout / planning / skew audits
    "compaction_plan",
    "join_key_skew",
    "join_size_estimate",
    "zone_map_skip_audit",
    "rendezvous_reshard_audit",
    # training-mix / curation audits
    "split_leakage_audit",
    "epoch_interleave",
    "budget_allocation",
    "source_ablation",
    "batch_mix_audit",
    "fd_audit",
    # IVM
    "ivm_join_revenue",
]

# r05 window kept for the rotation-history tests (all 50 went green
# in CORRECTNESS_r05; see the module docstring's audit trail).
_WINDOW_R05 = [
    # round-4 additions: stats / dq / sketches
    "referential_integrity",
    "seasonal_anomalies",
    "ewma_user_value",
    "ab_test_chi2",
    "cusum_changepoint",
    "weekly_autocorr",
    "segment_trend",
    "k_anonymity_audit",
    "freshness_audit",
    "enum_domain_audit",
    "cms_user_counts",
    "bloom_filter_audit",
    "hll_user_sketch",
    "kmv_overlap",
    # round-4 additions: analytics / layout / similarity / chunking
    "basket_pairs",
    "ann_rank_fusion",
    "zorder_layout",
    "vocab_growth",
    "readability",
    "last_touch_attribution",
    "session_window_stats",
    "debounce_events",
    "pit_dimension_join",
    "payload_chunks_fixed",
    # reshaped after the r04 canonicalizer red (array -> csv string)
    "embedding_quantize",
    # older judge-only tier: text / LM / dedup / clustering
    "token_rarity",
    "unigram_lm_score",
    "source_kl_divergence",
    "quality_weighted_sample",
    "shared_substrings",
    "substring_dup_docs",
    "cluster_keep_list",
    "heavy_hitters",
    "frame_sample",
    # older judge-only tier: sampling / skew / changelog / range joins
    "dataset_split",
    "stratified_sample",
    "mixture_sample",
    "source_cap",
    "purchases_agg_salted",
    "ktable_latest",
    "prior_clicks_before_error",
    "error_window_counts",
    # round-5 additions: lexical statistics + customer segmentation
    "hapax_rate",
    "tokenizer_fertility",
    "term_cooccurrence",
    "doclen_log_hist",
    "prefix_dup_groups",
    "rfm_segments",
    "spend_gini",
    "order_gap_stats",
]

# r04 window kept for the rotation-history tests and so the docstring's
# audit trail stays executable documentation.
_WINDOW_R04 = [
    # BPE tokenizer family
    "bpe_train",
    "bpe_encode",
    "bpe_doc_tokens",
    # graph / dedup additions
    "kcore",
    "edit_distance_pairs",
    "line_dedup",
    "incremental_dedup",
    "containment_pairs",
    "doc_ngram_novelty",
    "dedup_tier_agreement",
    "dup_graph_degrees",
    "knn_triangles",
    # product quantization stack
    "pq_codes",
    "pq_ann",
    "pq_ann_rerank",
    "pq_recall",
    # embedding quantization + multiprobe LSH
    "embedding_quantize",
    "quantization_error",
    "lsh_multiprobe",
    "lsh_multiprobe_recall",
    # temporal / CDC / IVM
    "scd2_history",
    "gap_fill_daily",
    "snapshot_diff",
    "snapshot_diff_full",
    "ivm_status_counts",
    # sketches + scale forms
    "equi_depth_histogram",
    "equi_depth_histogram_2p",
    "token_budget_selection",
    "token_budget_selection_2p",
    "pareto_orders",
    # features / stats / dq
    "target_encoding",
    "feature_hashing",
    "correlation_matrix",
    "table_profile",
    "distribution_drift",
    "benford_audit",
    "robust_event_outliers",
    "segment_spend_quantiles",
    # analytics additions
    "ltv_cohorts",
    "funnel_within_window",
    "activity_heatmap",
    "stickiness_weekly",
    "event_transitions",
    # text / search additions
    "inverted_index",
    "lang_confusion",
    "source_distinctive_terms",
    # curation capstones + mixtures
    "training_manifest",
    "corpus_keep_full",
    "quality_tiers",
    "mixture_weights",
]


def _apply_window(window: list[str]) -> None:
    """Reorder the registry so ``window`` occupies slots 0-49 (the
    driver's hash-checked prefix) and everything else follows in its
    original family order. Fails loudly on a typo or a window entry
    missing its oracle — a silent miss would waste a driver round."""
    missing = [n for n in window if n not in _QUERIES]
    assert not missing, f"window names not registered: {missing}"
    no_oracle = [n for n in window if n not in _ORACLES]
    assert not no_oracle, f"window names lack oracles: {no_oracle}"
    # The driver hash-checks the first 50 slots. The window may run
    # SHORT of 50 mid-round (r08+): the extra prefix slots then fall
    # to already-green families, which re-check harmlessly. It must
    # never exceed 50 — a 51st entry would silently skip the gate.
    assert len(window) == len(set(window)) <= 50, len(window)
    ordered = {n: _QUERIES[n] for n in window}
    # keep-scope adjacency: each shared-pin family runs back-to-back.
    # _EMB_CHAIN first (round 12) — it CONTINUES the window's trailing
    # embedding/ANN fragment, so the sim.* pins stay warm across the
    # window boundary; then the dedup audit+pairs families (their
    # window fragment is separate — see _WINDOW_R12's dedup block
    # note), then the fully-in-window families (no-ops this round).
    for chain in (
        _EMB_CHAIN,
        _DEDUP_AUDIT_CHAIN,
        _DEDUP_PAIRS_CHAIN,
        _GRAPH_CHAIN,
        _CUR_CHAIN,
        _MM_CHAIN,
    ):
        for n in chain:
            if n in _QUERIES and n not in ordered:
                ordered[n] = _QUERIES[n]
    for n, fn in _QUERIES.items():
        if n not in ordered:
            ordered[n] = fn
    _QUERIES.clear()
    _QUERIES.update(ordered)


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return

    # ---------------------------------------------------------------
    # Registrations are grouped by FAMILY; the driver window is
    # applied as a reorder at the end (_apply_window(_WINDOW_R04)).
    # ---------------------------------------------------------------

    from .operators import clustering, dedup, similarity, spectral

    register("exact_dedup", dedup.exact_dedup_query, dedup.EXACT_DEDUP_ORACLE)
    register(
        "ngram_jaccard_pairs",
        dedup.ngram_jaccard_pairs_query,
        dedup.NGRAM_JACCARD_ORACLE,
    )
    register(
        "minhash_lsh_pairs", dedup.minhash_lsh_pairs_query, dedup.MINHASH_LSH_ORACLE
    )
    register("simhash", dedup.simhash_query, dedup.SIMHASH_ORACLE)
    register("simhash_pairs", dedup.simhash_pairs_query, dedup.SIMHASH_PAIRS_ORACLE)
    register(
        "contamination", dedup.contamination_query, dedup.CONTAMINATION_ORACLE
    )
    register(
        "boilerplate_ngrams",
        dedup.boilerplate_ngrams_query,
        dedup.BOILERPLATE_NGRAMS_ORACLE,
    )

    register(
        "dedup_clusters",
        clustering.dedup_clusters_query,
        clustering.DEDUP_CLUSTERS_ORACLE,
    )
    register(
        "embedding_dup_clusters",
        clustering.embedding_dup_clusters_query,
        clustering.EMBEDDING_DUP_CLUSTERS_ORACLE,
    )
    register(
        "dup_pagerank", clustering.dup_pagerank_query, clustering.DUP_PAGERANK_ORACLE
    )

    register("ann_topk", similarity.ann_topk_query, similarity.ANN_TOPK_ORACLE)
    register(
        "ivf_near_dup", similarity.ivf_near_dup_query, similarity.IVF_NEAR_DUP_ORACLE
    )
    register(
        "label_centroids",
        similarity.label_centroids_query,
        similarity.LABEL_CENTROIDS_ORACLE,
    )
    register("ivf_assign", similarity.ivf_assign_query, similarity.IVF_ASSIGN_ORACLE)
    # Deterministic cell-probed top-k (nprobe dial): unlike lsh_ann the
    # whole search is oracle-checked; ann_topk is its recall reference.
    register("ivf_ann", similarity.ivf_ann_query, similarity.IVF_ANN_ORACLE)
    register(
        "dyn_ivf_assign",
        similarity.dyn_ivf_assign_query,
        similarity.DYN_IVF_ASSIGN_ORACLE,
    )
    register(
        "embedding_outliers",
        similarity.embedding_outliers_query,
        similarity.EMBEDDING_OUTLIERS_ORACLE,
    )
    register(
        "knn_graph",
        similarity.knn_graph_query,
        similarity.KNN_GRAPH_ORACLE,
    )
    register(
        "embedding_diversity",
        similarity.embedding_diversity_query,
        similarity.EMBEDDING_DIVERSITY_ORACLE,
    )
    # Recall@k of the rows-only lsh_ann vs the exact baseline —
    # deterministic, so the LSH tier's quality contract is itself
    # hash-checked even though the raw search cannot be.
    register(
        "lsh_ann_recall",
        similarity.lsh_ann_recall_query,
        similarity.LSH_ANN_RECALL_ORACLE,
    )

    register(
        "power_iteration",
        spectral.power_iteration_query,
        spectral.POWER_ITERATION_ORACLE,
    )

    from .operators import dq, sketches, stats

    register(
        "segment_spend_stats",
        stats.segment_spend_stats_query,
        stats.SEGMENT_SPEND_STATS_ORACLE,
    )
    register(
        "segment_spend_median",
        stats.segment_spend_median_query,
        stats.SEGMENT_SPEND_MEDIAN_ORACLE,
    )
    register(
        "winsorized_event_stats",
        stats.winsorized_event_stats_query,
        stats.WINSORIZED_EVENT_STATS_ORACLE,
    )
    register(
        "event_anomalies",
        stats.event_anomalies_query,
        stats.EVENT_ANOMALIES_ORACLE,
    )

    register(
        "data_quality_audit",
        dq.data_quality_audit_query,
        dq.DATA_QUALITY_AUDIT_ORACLE,
    )

    register(
        "distinct_users_daily",
        sketches.distinct_users_daily_query,
        sketches.DISTINCT_USERS_DAILY_ORACLE,
    )
    # Sketch estimates are engine-specific, so the registered form
    # asserts the error bound IN the result (exact values + universally
    # true within-bound booleans the oracle hash-checks); the tight
    # per-sigma accuracy assertions live in tests/test_sketches.py
    # against the raw-estimate variants.
    register(
        "approx_distinct_users",
        sketches.approx_distinct_check_query,
        sketches.APPROX_DISTINCT_CHECK_ORACLE,
    )
    register(
        "approx_percentiles",
        sketches.approx_percentiles_check_query,
        sketches.APPROX_PCT_CHECK_ORACLE,
    )
    register(
        "value_percentiles",
        sketches.value_percentiles_query,
        sketches.VALUE_PERCENTILES_ORACLE,
    )
    register("top_events", sketches.top_events_query, sketches.TOP_EVENTS_ORACLE)
    register(
        "value_histogram",
        sketches.value_histogram_query,
        sketches.VALUE_HISTOGRAM_ORACLE,
    )

    from .operators import codec, curation, multimodal, textops

    register("corpus_keep", curation.corpus_keep_query, curation.CORPUS_KEEP_ORACLE)

    register("quality_score", textops.quality_score_query, textops.QUALITY_SCORE_ORACLE)
    register(
        "tfidf_top_terms",
        textops.tfidf_top_terms_query,
        textops.TFIDF_TOP_TERMS_ORACLE,
    )
    register("token_count", textops.token_count_query, textops.TOKEN_COUNT_ORACLE)
    register("doc_fingerprint", textops.fingerprint_query, textops.FINGERPRINT_ORACLE)
    register("lang_id", textops.lang_id_query, textops.LANG_ID_ORACLE)
    register("clean_text", textops.clean_text_query, textops.CLEAN_TEXT_ORACLE)
    register("pii_scan", textops.pii_scan_query, textops.PII_SCAN_ORACLE)
    register("doc_chunks", textops.doc_chunks_query, textops.DOC_CHUNKS_ORACLE)
    register("bm25_search", textops.bm25_search_query, textops.BM25_SEARCH_ORACLE)
    register(
        "chunk_packing", textops.chunk_packing_query, textops.CHUNK_PACKING_ORACLE
    )
    register(
        "gopher_quality", textops.gopher_quality_query, textops.GOPHER_QUALITY_ORACLE
    )
    register(
        "doc_repetition", textops.doc_repetition_query, textops.DOC_REPETITION_ORACLE
    )
    register(
        "vocab_coverage", textops.vocab_coverage_query, textops.VOCAB_COVERAGE_ORACLE
    )
    register(
        "source_profile", textops.source_profile_query, textops.SOURCE_PROFILE_ORACLE
    )
    register(
        "source_overlap", textops.source_overlap_query, textops.SOURCE_OVERLAP_ORACLE
    )
    register(
        "bpe_merge_candidates",
        textops.bpe_merge_candidates_query,
        textops.BPE_MERGE_CANDIDATES_ORACLE,
    )

    register(
        "multimodal_features",
        multimodal.multimodal_features_query,
        multimodal.MULTIMODAL_FEATURES_ORACLE,
    )

    # Approximate by construction (bucketed recall < 1): rows-only
    # check; lsh_ann_recall hash-checks its quality.
    register("lsh_ann", similarity.lsh_ann_query, None)
    register(
        "token_rarity", textops.token_rarity_query, textops.TOKEN_RARITY_ORACLE
    )
    register(
        "cluster_keep_list",
        clustering.cluster_keep_list_query,
        clustering.CLUSTER_KEEP_LIST_ORACLE,
    )
    register(
        "heavy_hitters",
        sketches.heavy_hitters_check_query,
        sketches.HEAVY_HITTERS_CHECK_ORACLE,
    )
    register(
        "frame_sample", multimodal.frame_sample_query, multimodal.FRAME_SAMPLE_ORACLE
    )

    from .operators import sampling, skew

    register(
        "dataset_split", sampling.dataset_split_query, sampling.DATASET_SPLIT_ORACLE
    )
    register(
        "stratified_sample",
        sampling.stratified_sample_query,
        sampling.STRATIFIED_SAMPLE_ORACLE,
    )
    register(
        "mixture_sample", sampling.mixture_sample_query, sampling.MIXTURE_SAMPLE_ORACLE
    )
    register("source_cap", sampling.source_cap_query, sampling.SOURCE_CAP_ORACLE)
    register(
        "purchases_agg_salted",
        skew.purchases_agg_salted_query,
        skew.PURCHASES_AGG_SALTED_ORACLE,
    )

    from .operators import changelog, rangejoin

    register(
        "ktable_latest", changelog.ktable_latest_query, changelog.KTABLE_LATEST_ORACLE
    )
    register(
        "prior_clicks_before_error",
        rangejoin.prior_clicks_before_error_query,
        rangejoin.PRIOR_CLICKS_BEFORE_ERROR_ORACLE,
    )
    register(
        "error_window_counts",
        rangejoin.error_window_counts_query,
        rangejoin.ERROR_WINDOW_COUNTS_ORACLE,
    )

    from .operators import mapvalues, purchases, wordcount

    register("wordcount", wordcount.wordcount_query, wordcount.WORDCOUNT_ORACLE)
    register(
        "wordcount_point_lookup",
        wordcount.point_lookup_query,
        wordcount.POINT_LOOKUP_ORACLE,
    )
    register(
        "purchases_agg", purchases.purchases_agg_query, purchases.PURCHASES_AGG_ORACLE
    )
    register(
        "purchases_range_scan", purchases.range_scan_query, purchases.RANGE_SCAN_ORACLE
    )
    register("uppercase", mapvalues.uppercase_query, mapvalues.UPPERCASE_ORACLE)
    register("json_enrich", mapvalues.json_enrich_query, mapvalues.JSON_ENRICH_ORACLE)
    register(
        "json_props_stats",
        mapvalues.json_props_stats_query,
        mapvalues.JSON_PROPS_STATS_ORACLE,
    )

    from .operators import analytics as an

    register("pricing_summary", an.pricing_summary_query, an.PRICING_SUMMARY_ORACLE)
    register(
        "shipping_priority", an.shipping_priority_query, an.SHIPPING_PRIORITY_ORACLE
    )
    register(
        "local_supplier_revenue",
        an.local_supplier_revenue_query,
        an.LOCAL_SUPPLIER_REVENUE_ORACLE,
    )
    register(
        "top_orders_per_customer",
        an.top_orders_per_customer_query,
        an.TOP_ORDERS_PER_CUSTOMER_ORACLE,
    )
    register("revenue_rollup", an.revenue_rollup_query, an.REVENUE_ROLLUP_ORACLE)
    register(
        "active_rich_customers",
        an.active_rich_customers_query,
        an.ACTIVE_RICH_CUSTOMERS_ORACLE,
    )
    register(
        "customers_without_orders",
        an.customers_without_orders_query,
        an.CUSTOMERS_WITHOUT_ORDERS_ORACLE,
    )
    register(
        "customers_with_open_orders",
        an.customers_with_open_orders_query,
        an.CUSTOMERS_WITH_OPEN_ORDERS_ORACLE,
    )
    register("events_hourly", an.events_hourly_query, an.EVENTS_HOURLY_ORACLE)
    register("user_sessions", an.user_sessions_query, an.USER_SESSIONS_ORACLE)
    register(
        "asof_prev_purchase",
        an.asof_prev_purchase_query,
        an.ASOF_PREV_PURCHASE_ORACLE,
    )
    register("events_hopping", an.events_hopping_query, an.EVENTS_HOPPING_ORACLE)
    register("revenue_cube", an.revenue_cube_query, an.REVENUE_CUBE_ORACLE)
    register(
        "revenue_grouping_sets",
        an.revenue_grouping_sets_query,
        an.REVENUE_GROUPING_SETS_ORACLE,
    )
    register(
        "click_no_purchase_days",
        an.click_no_purchase_days_query,
        an.CLICK_NO_PURCHASE_DAYS_ORACLE,
    )
    register(
        "error_and_signup_days",
        an.error_and_signup_days_query,
        an.ERROR_AND_SIGNUP_DAYS_ORACLE,
    )
    register("events_pivot", an.events_pivot_query, an.EVENTS_PIVOT_ORACLE)
    register("events_unpivot", an.events_unpivot_query, an.EVENTS_UNPIVOT_ORACLE)
    register(
        "funnel_conversion",
        an.funnel_conversion_query,
        an.FUNNEL_CONVERSION_ORACLE,
    )
    register(
        "retention_cohorts",
        an.retention_cohorts_query,
        an.RETENTION_COHORTS_ORACLE,
    )
    register(
        "revenue_forecast", an.revenue_forecast_query, an.REVENUE_FORECAST_ORACLE
    )
    register(
        "customer_balance_quartiles",
        an.customer_balance_quartiles_query,
        an.CUSTOMER_BALANCE_QUARTILES_ORACLE,
    )
    register(
        "rolling_user_value",
        an.rolling_user_value_query,
        an.ROLLING_USER_VALUE_ORACLE,
    )
    register(
        "user_event_type_sets",
        an.user_event_type_sets_query,
        an.USER_EVENT_TYPE_SETS_ORACLE,
    )

    from .operators import subqueries as sq

    register(
        "cust_order_counts", sq.cust_order_counts_query, sq.CUST_ORDER_COUNTS_ORACLE
    )
    register("promo_revenue", sq.promo_revenue_query, sq.PROMO_REVENUE_ORACLE)
    register("top_value_parts", sq.top_value_parts_query, sq.TOP_VALUE_PARTS_ORACLE)
    # small_qty_revenue (Q17) is registered from operators/trade.py
    # below — the earlier subqueries.py variant was deleted in round 9
    # after the round-8 shadowing incident (one owner per name).
    register(
        "brand_disjunction_revenue",
        sq.brand_disjunction_revenue_query,
        sq.BRAND_DISJUNCTION_REVENUE_ORACLE,
    )
    register(
        "idle_rich_customers",
        sq.idle_rich_customers_query,
        sq.IDLE_RICH_CUSTOMERS_ORACLE,
    )
    register(
        "latest_shipper_counts",
        sq.latest_shipper_counts_query,
        sq.LATEST_SHIPPER_COUNTS_ORACLE,
    )
    register(
        "top_revenue_supplier",
        sq.top_revenue_supplier_query,
        sq.TOP_REVENUE_SUPPLIER_ORACLE,
    )
    register(
        "bulk_part_suppliers",
        sq.bulk_part_suppliers_query,
        sq.BULK_PART_SUPPLIERS_ORACLE,
    )

    from .operators import trade

    register(
        "volume_shipping", trade.volume_shipping_query, trade.VOLUME_SHIPPING_ORACLE
    )
    register("market_share", trade.market_share_query, trade.MARKET_SHARE_ORACLE)
    register("product_profit", trade.product_profit_query, trade.PRODUCT_PROFIT_ORACLE)
    register(
        "late_order_priority",
        trade.late_order_priority_query,
        trade.LATE_ORDER_PRIORITY_ORACLE,
    )
    register(
        "returned_items_top_customers",
        trade.returned_items_top_customers_query,
        trade.RETURNED_ITEMS_TOP_CUSTOMERS_ORACLE,
    )
    register(
        "supplier_part_variety",
        trade.supplier_part_variety_query,
        trade.SUPPLIER_PART_VARIETY_ORACLE,
    )
    register(
        "large_volume_customers",
        trade.large_volume_customers_query,
        trade.LARGE_VOLUME_CUSTOMERS_ORACLE,
    )
    register(
        "min_cost_supplier",
        trade.min_cost_supplier_query,
        trade.MIN_COST_SUPPLIER_ORACLE,
    )
    register(
        "important_part_values",
        trade.important_part_values_query,
        trade.IMPORTANT_PART_VALUES_ORACLE,
    )
    register(
        "shipping_speed_priority",
        trade.shipping_speed_priority_query,
        trade.SHIPPING_SPEED_PRIORITY_ORACLE,
    )

    # Corpus language-model scoring (CCNet/KenLM-style curation tier)
    from .operators import lm

    register("unigram_lm_score", lm.unigram_lm_score_query, lm.UNIGRAM_LM_ORACLE)
    register(
        "source_kl_divergence",
        lm.source_kl_divergence_query,
        lm.SOURCE_KL_ORACLE,
    )
    register(
        "quality_weighted_sample",
        lm.quality_weighted_sample_query,
        lm.QUALITY_WEIGHTED_SAMPLE_ORACLE,
    )

    # Exact-substring dedup (Lee et al. 2022 rolling-window form)
    from .operators import substring_dedup

    register(
        "shared_substrings",
        substring_dedup.shared_substrings_query,
        substring_dedup.SHARED_SUBSTRINGS_ORACLE,
    )
    register(
        "substring_dup_docs",
        substring_dedup.substring_dup_docs_query,
        substring_dedup.SUBSTRING_DUP_DOCS_ORACLE,
    )
    register(
        "doc_ngram_novelty",
        dedup.doc_ngram_novelty_query,
        dedup.DOC_NGRAM_NOVELTY_ORACLE,
    )

    # Embedding int8 quantization (serving/ANN storage tier)
    from .operators import quantize

    register(
        "embedding_quantize",
        quantize.embedding_quantize_query,
        quantize.EMBEDDING_QUANTIZE_ORACLE,
    )
    register(
        "quantization_error",
        quantize.quantization_error_query,
        quantize.QUANTIZATION_ERROR_ORACLE,
    )
    register(
        "quality_tiers", sampling.quality_tiers_query, sampling.QUALITY_TIERS_ORACLE
    )
    register(
        "mixture_weights", lm.mixture_weights_query, lm.MIXTURE_WEIGHTS_ORACLE
    )
    register(
        "dup_graph_degrees",
        clustering.dup_graph_degrees_query,
        clustering._degrees_oracle(),
    )
    register(
        "robust_event_outliers",
        stats.robust_event_outliers_query,
        stats.ROBUST_EVENT_OUTLIERS_ORACLE,
    )
    register(
        "incremental_dedup",
        dedup.incremental_dedup_query,
        dedup._incremental_oracle(),
    )
    register(
        "corpus_keep_full",
        curation.corpus_keep_full_query,
        curation.CORPUS_KEEP_FULL_ORACLE,
    )
    register(
        "knn_triangles",
        similarity.knn_triangles_query,
        similarity.KNN_TRIANGLES_ORACLE,
    )

    # BPE tokenizer training loop (iterative merges, vocab-sized work)
    from .operators import bpe

    register("bpe_train", bpe.bpe_train_query, bpe.BPE_TRAIN_ORACLE)
    register("bpe_encode", bpe.bpe_encode_query, bpe.BPE_ENCODE_ORACLE)

    # k-core nucleus of the near-dup graph (iterative peel)
    register("kcore", clustering.kcore_query, clustering.KCORE_ORACLE)

    # character-level verify tier on LSH candidates
    register(
        "edit_distance_pairs",
        dedup.edit_distance_pairs_query,
        dedup.EDIT_DISTANCE_PAIRS_ORACLE,
    )

    # batch inverted-index artifact (search-serving build)
    register(
        "inverted_index",
        textops.inverted_index_query,
        textops.INVERTED_INDEX_ORACLE,
    )

    # temporal maintenance: SCD2 history + dense-spine gap fill
    from .operators import temporal

    register(
        "scd2_history", temporal.scd2_history_query, temporal.SCD2_HISTORY_ORACLE
    )
    register(
        "gap_fill_daily",
        temporal.gap_fill_daily_query,
        temporal.GAP_FILL_DAILY_ORACLE,
    )
    register(
        "equi_depth_histogram",
        sketches.equi_depth_histogram_query,
        sketches.EQUI_DEPTH_HISTOGRAM_ORACLE,
    )

    # product quantization: codes artifact + ADC compressed-domain ANN
    from .operators import pq

    register("pq_codes", pq.pq_codes_query, pq.PQ_CODES_ORACLE)
    register("pq_ann", pq.pq_ann_query, pq.PQ_ANN_ORACLE)
    register(
        "pq_ann_rerank", pq.pq_ann_rerank_query, pq.PQ_ANN_RERANK_ORACLE
    )
    register("pq_recall", pq.pq_recall_query, pq.PQ_RECALL_ORACLE)

    # batch CDC between table snapshots (keys-only audit shape +
    # apply-ready payload shape, see run_apply_changes contract)
    register(
        "snapshot_diff",
        temporal.snapshot_diff_query,
        temporal.SNAPSHOT_DIFF_ORACLE,
    )
    register(
        "snapshot_diff_full",
        temporal.snapshot_diff_full_query,
        temporal.SNAPSHOT_DIFF_FULL_ORACLE,
    )

    # ML feature materialization
    from .operators import features

    register(
        "target_encoding",
        features.target_encoding_query,
        features.TARGET_ENCODING_ORACLE,
    )
    register(
        "feature_hashing",
        features.feature_hashing_query,
        features.FEATURE_HASHING_ORACLE,
    )
    register(
        "correlation_matrix",
        stats.correlation_matrix_query,
        stats.CORRELATION_MATRIX_ORACLE,
    )
    register(
        "table_profile",
        stats.table_profile_query,
        stats.TABLE_PROFILE_ORACLE,
    )
    register(
        "distribution_drift",
        dq.distribution_drift_query,
        dq.DISTRIBUTION_DRIFT_ORACLE,
    )
    register(
        "pareto_orders", an.pareto_orders_query, an.PARETO_ORDERS_ORACLE
    )
    register(
        "bpe_doc_tokens", bpe.bpe_doc_tokens_query, bpe.BPE_DOC_TOKENS_ORACLE
    )
    register(
        "benford_audit", dq.benford_audit_query, dq.BENFORD_AUDIT_ORACLE
    )
    register("ltv_cohorts", an.ltv_cohorts_query, an.LTV_COHORTS_ORACLE)
    register("line_dedup", dedup.line_dedup_query, dedup.LINE_DEDUP_ORACLE)
    register(
        "training_manifest",
        curation.training_manifest_query,
        curation.TRAINING_MANIFEST_ORACLE,
    )
    register(
        "lsh_multiprobe",
        similarity.lsh_multiprobe_query,
        similarity.LSH_MULTIPROBE_ORACLE,
    )
    register(
        "lsh_multiprobe_recall",
        similarity.lsh_multiprobe_recall_query,
        similarity.LSH_MULTIPROBE_RECALL_ORACLE,
    )
    register(
        "ivm_status_counts",
        temporal.ivm_status_counts_query,
        temporal.IVM_STATUS_COUNTS_ORACLE,
    )
    register(
        "segment_spend_quantiles",
        stats.segment_spend_quantiles_query,
        stats.SEGMENT_SPEND_QUANTILES_ORACLE,
    )
    register(
        "token_budget_selection",
        sampling.token_budget_selection_query,
        sampling.TOKEN_BUDGET_SELECTION_ORACLE,
    )
    # Two-pass scale form: SAME oracle as the exact form — the driver
    # hash check doubles as the equivalence proof.
    register(
        "token_budget_selection_2p",
        sampling.token_budget_selection_2p_query,
        sampling.TOKEN_BUDGET_SELECTION_ORACLE,
    )
    register(
        "equi_depth_histogram_2p",
        sketches.equi_depth_histogram_2p_query,
        sketches.EQUI_DEPTH_2P_ORACLE,
    )
    register(
        "containment_pairs",
        dedup.containment_pairs_query,
        dedup.CONTAINMENT_PAIRS_ORACLE,
    )
    register(
        "lang_confusion",
        textops.lang_confusion_query,
        textops.LANG_CONFUSION_ORACLE,
    )
    register(
        "funnel_within_window",
        an.funnel_within_window_query,
        an.FUNNEL_WITHIN_WINDOW_ORACLE,
    )
    register(
        "source_distinctive_terms",
        textops.source_distinctive_terms_query,
        textops.SOURCE_DISTINCTIVE_TERMS_ORACLE,
    )
    register(
        "activity_heatmap",
        an.activity_heatmap_query,
        an.ACTIVITY_HEATMAP_ORACLE,
    )
    register(
        "stickiness_weekly",
        an.stickiness_weekly_query,
        an.STICKINESS_WEEKLY_ORACLE,
    )
    register(
        "event_transitions",
        an.event_transitions_query,
        an.EVENT_TRANSITIONS_ORACLE,
    )
    register(
        "dedup_tier_agreement",
        dedup.dedup_tier_agreement_query,
        dedup.DEDUP_TIER_AGREEMENT_ORACLE,
    )

    # ---- round-4 additions (driver rows next rotation) ----
    register(
        "referential_integrity",
        dq.referential_integrity_query,
        dq.REFERENTIAL_INTEGRITY_ORACLE,
    )
    register(
        "seasonal_anomalies",
        stats.seasonal_anomalies_query,
        stats.SEASONAL_ANOMALIES_ORACLE,
    )

    from .operators import basket

    register(
        "basket_pairs", basket.basket_pairs_query, basket.BASKET_PAIRS_ORACLE
    )
    register(
        "ann_rank_fusion",
        similarity.ann_rank_fusion_query,
        similarity.ANN_RANK_FUSION_ORACLE,
    )

    from .operators import layout

    register(
        "zorder_layout", layout.zorder_layout_query, layout.ZORDER_LAYOUT_ORACLE
    )
    register(
        "vocab_growth", textops.vocab_growth_query, textops.VOCAB_GROWTH_ORACLE
    )
    register(
        "ewma_user_value",
        stats.ewma_user_value_query,
        stats.EWMA_USER_VALUE_ORACLE,
    )
    register(
        "ab_test_chi2", stats.ab_test_chi2_query, stats.AB_TEST_CHI2_ORACLE
    )
    register(
        "last_touch_attribution",
        an.last_touch_attribution_query,
        an.LAST_TOUCH_ATTRIBUTION_ORACLE,
    )

    from .operators import chunking

    register(
        "payload_chunks_fixed",
        chunking.payload_chunks_fixed_query,
        chunking.PAYLOAD_CHUNKS_FIXED_ORACLE,
    )
    # Content-defined chunking: the Gear rolling hash is not
    # SQL-expressible — rows-only; its contract (determinism,
    # coverage, bounds, boundary re-synchronization under edits)
    # is pinned in tests/test_chunking.py.
    register("payload_chunks_cdc", chunking.payload_chunks_cdc_query, None)
    register(
        "session_window_stats",
        an.session_window_stats_query,
        an.SESSION_WINDOW_STATS_ORACLE,
    )
    register(
        "pit_dimension_join",
        temporal.pit_dimension_join_query,
        temporal.PIT_DIMENSION_JOIN_ORACLE,
    )
    register(
        "cms_user_counts",
        sketches.cms_user_counts_query,
        sketches.CMS_USER_COUNTS_ORACLE,
    )
    register(
        "bloom_filter_audit",
        sketches.bloom_filter_audit_query,
        sketches.BLOOM_FILTER_AUDIT_ORACLE,
    )
    register(
        "k_anonymity_audit",
        dq.k_anonymity_audit_query,
        dq.K_ANONYMITY_AUDIT_ORACLE,
    )
    register(
        "hll_user_sketch",
        sketches.hll_user_sketch_query,
        sketches.HLL_USER_SKETCH_ORACLE,
    )
    register(
        "kmv_overlap",
        sketches.kmv_overlap_query,
        sketches.KMV_OVERLAP_ORACLE,
    )
    register(
        "cusum_changepoint",
        stats.cusum_changepoint_query,
        stats.CUSUM_CHANGEPOINT_ORACLE,
    )
    register(
        "freshness_audit", dq.freshness_audit_query, dq.FRESHNESS_AUDIT_ORACLE
    )
    register(
        "enum_domain_audit",
        dq.enum_domain_audit_query,
        dq.ENUM_DOMAIN_AUDIT_ORACLE,
    )
    register(
        "debounce_events",
        an.debounce_events_query,
        an.DEBOUNCE_EVENTS_ORACLE,
    )
    register(
        "readability", textops.readability_query, textops.READABILITY_ORACLE
    )
    register(
        "weekly_autocorr",
        stats.weekly_autocorr_query,
        stats.WEEKLY_AUTOCORR_ORACLE,
    )
    register(
        "segment_trend", stats.segment_trend_query, stats.SEGMENT_TREND_ORACLE
    )

    # ---- round-5 additions ----
    from .operators import lexstats, segmentation

    register(
        "hapax_rate", lexstats.hapax_rate_query, lexstats.HAPAX_RATE_ORACLE
    )
    register(
        "tokenizer_fertility",
        lexstats.tokenizer_fertility_query,
        lexstats.TOKENIZER_FERTILITY_ORACLE,
    )
    register(
        "term_cooccurrence",
        lexstats.term_cooccurrence_query,
        lexstats.TERM_COOCCURRENCE_ORACLE,
    )
    register(
        "doclen_log_hist",
        lexstats.doclen_log_hist_query,
        lexstats.DOCLEN_LOG_HIST_ORACLE,
    )
    register(
        "prefix_dup_groups",
        lexstats.prefix_dup_groups_query,
        lexstats.PREFIX_DUP_GROUPS_ORACLE,
    )
    register(
        "rfm_segments",
        segmentation.rfm_segments_query,
        segmentation.RFM_SEGMENTS_ORACLE,
    )
    register(
        "spend_gini", segmentation.spend_gini_query, segmentation.SPEND_GINI_ORACLE
    )
    register(
        "order_gap_stats",
        segmentation.order_gap_stats_query,
        segmentation.ORDER_GAP_STATS_ORACLE,
    )

    # ---- round-5 late additions (round-6 window material) ----
    register(
        "sequence_gap_audit",
        dq.sequence_gap_audit_query,
        dq.SEQUENCE_GAP_AUDIT_ORACLE,
    )
    register(
        "watermark_lag_audit",
        dq.watermark_lag_audit_query,
        dq.WATERMARK_LAG_AUDIT_ORACLE,
    )
    register(
        "bigram_next_token",
        lm.bigram_next_token_query,
        lm.BIGRAM_NEXT_TOKEN_ORACLE,
    )
    register(
        "compaction_plan",
        layout.compaction_plan_query,
        layout.COMPACTION_PLAN_ORACLE,
    )
    register(
        "join_key_skew", skew.join_key_skew_query, skew.JOIN_KEY_SKEW_ORACLE
    )
    register("int8_ann", quantize.int8_ann_query, quantize.INT8_ANN_ORACLE)
    register(
        "int8_ann_recall",
        quantize.int8_ann_recall_query,
        quantize.INT8_ANN_RECALL_ORACLE,
    )
    # Lossless prefix-filtered set-similarity join: the oracle is the
    # NAIVE exact tau-join, so the hash check is a machine-checked
    # completeness proof of the prefix filter.
    register(
        "prefix_filter_pairs",
        dedup.prefix_filter_pairs_query,
        dedup.PREFIX_FILTER_PAIRS_ORACLE,
    )
    register(
        "matryoshka_recall",
        similarity.matryoshka_recall_query,
        similarity.MATRYOSHKA_RECALL_ORACLE,
    )
    register(
        "cluster_cohesion",
        similarity.cluster_cohesion_query,
        similarity.CLUSTER_COHESION_ORACLE,
    )
    register(
        "budget_allocation",
        sampling.budget_allocation_query,
        sampling.BUDGET_ALLOCATION_ORACLE,
    )
    register(
        "winnowing_fingerprints",
        dedup.winnowing_fingerprints_query,
        dedup.WINNOWING_FINGERPRINTS_ORACLE,
    )
    register(
        "split_leakage_audit",
        sampling.split_leakage_audit_query,
        sampling.SPLIT_LEAKAGE_AUDIT_ORACLE,
    )
    register(
        "epoch_interleave",
        sampling.epoch_interleave_query,
        sampling.EPOCH_INTERLEAVE_ORACLE,
    )
    register(
        "char_entropy",
        textops.char_entropy_query,
        textops.CHAR_ENTROPY_ORACLE,
    )
    register(
        "l_diversity_audit",
        dq.l_diversity_audit_query,
        dq.L_DIVERSITY_AUDIT_ORACLE,
    )
    register(
        "source_modularity",
        clustering.source_modularity_query,
        clustering._source_modularity_oracle(),
    )
    register(
        "degree_assortativity",
        clustering.degree_assortativity_query,
        clustering._degree_assortativity_oracle(),
    )
    register(
        "sorted_neighborhood_pairs",
        dedup.sorted_neighborhood_pairs_query,
        dedup.SORTED_NEIGHBORHOOD_PAIRS_ORACLE,
    )
    register(
        "blocking_recall_audit",
        dedup.blocking_recall_audit_query,
        dedup.BLOCKING_RECALL_AUDIT_ORACLE,
    )
    register(
        "join_size_estimate",
        sketches.join_size_estimate_query,
        sketches.JOIN_SIZE_ESTIMATE_ORACLE,
    )
    register(
        "t_closeness_audit",
        dq.t_closeness_audit_query,
        dq.T_CLOSENESS_AUDIT_ORACLE,
    )
    register(
        "resize_payload",
        multimodal.resize_payload_query,
        multimodal.RESIZE_PAYLOAD_ORACLE,
    )
    register(
        "systematic_weighted_sample",
        sampling.systematic_weighted_sample_query,
        sampling.SYSTEMATIC_WEIGHTED_SAMPLE_ORACLE,
    )
    register(
        "trimmed_mean_by_type",
        stats.trimmed_mean_by_type_query,
        stats.TRIMMED_MEAN_BY_TYPE_ORACLE,
    )
    register(
        "phrase_search",
        textops.phrase_search_query,
        textops.PHRASE_SEARCH_ORACLE,
    )
    register(
        "winnowing_pairs",
        dedup.winnowing_pairs_query,
        dedup.WINNOWING_PAIRS_ORACLE,
    )
    register(
        "bigram_lm_score",
        lm.bigram_lm_score_query,
        lm.BIGRAM_LM_ORACLE,
    )
    register(
        "transition_entropy",
        an.transition_entropy_query,
        an.TRANSITION_ENTROPY_ORACLE,
    )
    # Binary (1-bit) quantization tier: signatures, Hamming ANN, and
    # its recall gate vs the exact float search — completes the
    # float32 -> int8 -> PQ -> binary compression cascade.
    register(
        "binary_signatures",
        quantize.binary_signatures_query,
        quantize.BINARY_SIGNATURES_ORACLE,
    )
    register(
        "binary_ann", quantize.binary_ann_query, quantize.BINARY_ANN_ORACLE
    )
    register(
        "binary_ann_recall",
        quantize.binary_ann_recall_query,
        quantize.BINARY_ANN_RECALL_ORACLE,
    )
    register(
        "kneser_ney_bigram",
        lm.kneser_ney_bigram_query,
        lm.KNESER_NEY_BIGRAM_ORACLE,
    )
    register(
        "knn_lof_outliers",
        similarity.knn_lof_outliers_query,
        similarity.KNN_LOF_ORACLE,
    )
    register(
        "knn_label_purity",
        similarity.knn_label_purity_query,
        similarity.KNN_LABEL_PURITY_ORACLE,
    )
    register(
        "dp_laplace_counts",
        dq.dp_laplace_counts_query,
        dq.DP_LAPLACE_COUNTS_ORACLE,
    )
    register(
        "mutual_information",
        stats.mutual_information_query,
        stats.MUTUAL_INFORMATION_ORACLE,
    )
    register(
        "ivm_join_revenue",
        temporal.ivm_join_revenue_query,
        temporal.IVM_JOIN_REVENUE_ORACLE,
    )
    register(
        "quantized_ann_ndcg",
        quantize.quantized_ann_ndcg_query,
        quantize.QUANTIZED_ANN_NDCG_ORACLE,
    )
    register(
        "hll_rolling_distinct",
        sketches.hll_rolling_distinct_query,
        sketches.HLL_ROLLING_DISTINCT_ORACLE,
    )
    register(
        "charset_profile",
        textops.charset_profile_query,
        textops.CHARSET_PROFILE_ORACLE,
    )
    register(
        "bootstrap_se",
        stats.bootstrap_se_query,
        stats.BOOTSTRAP_SE_ORACLE,
    )
    register(
        "dsir_importance",
        lm.dsir_importance_query,
        lm.DSIR_IMPORTANCE_ORACLE,
    )
    from .operators import linkage

    register(
        "fs_linkage_scores",
        linkage.fs_linkage_scores_query,
        linkage.FS_LINKAGE_ORACLE,
    )
    register(
        "calibration_audit",
        features.calibration_audit_query,
        features.CALIBRATION_AUDIT_ORACLE,
    )
    register(
        "hll_distinct_rollup",
        sketches.hll_distinct_rollup_query,
        sketches.HLL_DISTINCT_ROLLUP_ORACLE,
    )
    register(
        "basket_triples",
        basket.basket_triples_query,
        basket.BASKET_TRIPLES_ORACLE,
    )
    register(
        "zipf_fit", lexstats.zipf_fit_query, lexstats.ZIPF_FIT_ORACLE
    )
    from .operators import nb

    register(
        "nb_lang_confusion",
        nb.nb_lang_confusion_query,
        nb.NB_LANG_CONFUSION_ORACLE,
    )
    register(
        "pii_redact", textops.pii_redact_query, textops.PII_REDACT_ORACLE
    )
    register(
        "km_user_survival",
        stats.km_user_survival_query,
        stats.KM_USER_SURVIVAL_ORACLE,
    )
    from .operators import layout as layout_mod

    register(
        "zone_map_skip_audit",
        layout_mod.zone_map_skip_audit_query,
        layout_mod.ZONE_MAP_SKIP_AUDIT_ORACLE,
    )
    register(
        "source_ablation",
        lm.source_ablation_query,
        lm.SOURCE_ABLATION_ORACLE,
    )
    register(
        "rendezvous_reshard_audit",
        layout_mod.rendezvous_reshard_audit_query,
        layout_mod.RENDEZVOUS_RESHARD_ORACLE,
    )
    register(
        "top_session_paths",
        an.top_session_paths_query,
        an.TOP_SESSION_PATHS_ORACLE,
    )
    register(
        "batch_mix_audit",
        sampling.batch_mix_audit_query,
        sampling.BATCH_MIX_ORACLE,
    )
    register("fd_audit", dq.fd_audit_query, dq.FD_AUDIT_ORACLE)
    register(
        "detector_kappa",
        dedup.detector_kappa_query,
        dedup.DETECTOR_KAPPA_ORACLE,
    )
    register(
        "ht_estimate_audit",
        sampling.ht_estimate_audit_query,
        sampling.HT_ESTIMATE_AUDIT_ORACLE,
    )

    # ---- round-6 additions (r07 window material; mirror the list in
    # tests/test_registry_window.py R07_MATERIAL) ----
    register(
        "priority_sample",
        sampling.priority_sample_query,
        sampling.PRIORITY_SAMPLE_ORACLE,
    )
    register(
        "neyman_allocation",
        sampling.neyman_allocation_query,
        sampling.NEYMAN_ALLOCATION_ORACLE,
    )
    register(
        "dp_topk_release",
        dq.dp_topk_release_query,
        dq.DP_TOPK_RELEASE_ORACLE,
    )
    register(
        "minhash_estimate_audit",
        dedup.minhash_estimate_audit_query,
        dedup.MINHASH_ESTIMATE_AUDIT_ORACLE,
    )
    register(
        "curriculum_pacing",
        curation.curriculum_pacing_query,
        curation.CURRICULUM_PACING_ORACLE,
    )
    register(
        "conformal_coverage_audit",
        stats.conformal_coverage_audit_query,
        stats.CONFORMAL_COVERAGE_AUDIT_ORACLE,
    )
    register(
        "mmr_rerank",
        similarity.mmr_rerank_query,
        similarity.MMR_RERANK_ORACLE,
    )
    register(
        "payload_phash",
        multimodal.payload_phash_query,
        multimodal.PAYLOAD_PHASH_ORACLE,
    )
    register(
        "phash_dup_pairs",
        multimodal.phash_dup_pairs_query,
        multimodal.PHASH_DUP_PAIRS_ORACLE,
    )
    register(
        "linkage_entities",
        linkage.linkage_entities_query,
        linkage.LINKAGE_ENTITIES_ORACLE,
    )
    register(
        "hilbert_layout",
        layout.hilbert_layout_query,
        layout.HILBERT_LAYOUT_ORACLE,
    )
    register(
        "dedup_token_savings",
        dedup.dedup_token_savings_query,
        dedup.DEDUP_TOKEN_SAVINGS_ORACLE,
    )
    register(
        "weighted_priority_sample",
        sampling.weighted_priority_sample_query,
        sampling.WEIGHTED_PRIORITY_SAMPLE_ORACLE,
    )
    register(
        "source_dedup_matrix",
        dedup.source_dedup_matrix_query,
        dedup.SOURCE_DEDUP_MATRIX_ORACLE,
    )
    register(
        "idle_customer_balance",
        an.idle_customer_balance_query,
        an.IDLE_CUSTOMER_BALANCE_ORACLE,
    )
    register(
        "source_similarity_matrix",
        textops.source_similarity_matrix_query,
        textops.SOURCE_SIMILARITY_MATRIX_ORACLE,
    )
    register(
        "ivf_probe_recall_curve",
        similarity.ivf_probe_recall_curve_query,
        similarity.IVF_PROBE_RECALL_CURVE_ORACLE,
    )

    # ---- round 7 additions ----
    from .operators import retrieval

    register(
        "ann_hubness_audit",
        retrieval.ann_hubness_audit_query,
        retrieval.ANN_HUBNESS_AUDIT_ORACLE,
    )
    register(
        "kcenter_coreset",
        retrieval.kcenter_coreset_query,
        retrieval.KCENTER_CORESET_ORACLE,
    )
    register(
        "maxsim_late_interaction",
        retrieval.maxsim_late_interaction_query,
        retrieval.MAXSIM_LATE_INTERACTION_ORACLE,
    )
    register(
        "rocchio_expansion",
        retrieval.rocchio_expansion_query,
        retrieval.ROCCHIO_EXPANSION_ORACLE,
    )
    from .operators import drift

    register(
        "ks_drift_audit",
        drift.ks_drift_audit_query,
        drift.KS_DRIFT_AUDIT_ORACLE,
    )
    register(
        "mmd_label_drift",
        drift.mmd_label_drift_query,
        drift.MMD_LABEL_DRIFT_ORACLE,
    )
    register(
        "ab_proportion_test",
        drift.ab_proportion_test_query,
        drift.AB_PROPORTION_TEST_ORACLE,
    )
    register(
        "simpson_reversal_audit",
        drift.simpson_reversal_audit_query,
        drift.SIMPSON_REVERSAL_AUDIT_ORACLE,
    )
    register(
        "jl_projection_audit",
        drift.jl_projection_audit_query,
        drift.JL_PROJECTION_AUDIT_ORACLE,
    )
    register(
        "theil_sen_trend",
        stats.theil_sen_trend_query,
        stats.THEIL_SEN_TREND_ORACLE,
    )
    register(
        "nelson_aalen_hazard",
        stats.nelson_aalen_hazard_query,
        stats.NELSON_AALEN_HAZARD_ORACLE,
    )
    register(
        "runs_test_randomness",
        stats.runs_test_randomness_query,
        stats.RUNS_TEST_RANDOMNESS_ORACLE,
    )
    register(
        "ams_f2_estimate",
        sketches.ams_f2_estimate_query,
        sketches.AMS_F2_ESTIMATE_ORACLE,
    )
    register(
        "dp_clipped_mean",
        dq.dp_clipped_mean_query,
        dq.DP_CLIPPED_MEAN_ORACLE,
    )
    register(
        "collocation_pmi",
        textops.collocation_pmi_query,
        textops.COLLOCATION_PMI_ORACLE,
    )
    register(
        "chao1_vocab_estimate",
        lexstats.chao1_vocab_estimate_query,
        lexstats.CHAO1_VOCAB_ESTIMATE_ORACLE,
    )
    register(
        "group_kfold_split",
        sampling.group_kfold_split_query,
        sampling.GROUP_KFOLD_SPLIT_ORACLE,
    )
    register(
        "layout_locality_audit",
        layout_mod.layout_locality_audit_query,
        layout_mod.LAYOUT_LOCALITY_AUDIT_ORACLE,
    )
    register(
        "bucket_plan",
        layout_mod.bucket_plan_query,
        layout_mod.BUCKET_PLAN_ORACLE,
    )
    register(
        "dedup_representative_stats",
        clustering.dedup_representative_stats_query,
        clustering.DEDUP_REPRESENTATIVE_STATS_ORACLE,
    )
    register(
        "session_concurrency",
        an.session_concurrency_query,
        an.SESSION_CONCURRENCY_ORACLE,
    )
    register(
        "poisson_dispersion_audit",
        stats.poisson_dispersion_audit_query,
        stats.POISSON_DISPERSION_AUDIT_ORACLE,
    )
    # ---- round-7 late additions (post-window-freeze -> r08 material,
    # tracked in tests/test_registry_window.py R08_MATERIAL) ----
    register(
        "facility_location_coreset",
        retrieval.facility_location_coreset_query,
        retrieval.FACILITY_LOCATION_CORESET_ORACLE,
    )
    register(
        "detector_mcnemar",
        dedup.detector_mcnemar_query,
        dedup.DETECTOR_MCNEMAR_ORACLE,
    )
    register(
        "rank_biased_overlap",
        quantize.rank_biased_overlap_query,
        quantize.RANK_BIASED_OVERLAP_ORACLE,
    )
    register(
        "label_purity_null_baseline",
        retrieval.label_purity_null_baseline_query,
        retrieval.LABEL_PURITY_NULL_BASELINE_ORACLE,
    )
    register(
        "gate_ordering_plan",
        curation.gate_ordering_plan_query,
        curation.GATE_ORDERING_PLAN_ORACLE,
    )
    register(
        "waterfill_allocation",
        sampling.waterfill_allocation_query,
        sampling.WATERFILL_ALLOCATION_ORACLE,
    )
    register(
        "salt_factor_plan",
        skew.salt_factor_plan_query,
        skew.SALT_FACTOR_PLAN_ORACLE,
    )

    # ---- round 8: nonparametric / rank-based inference tier ----
    from .operators import inference

    register(
        "mann_whitney_audit",
        inference.mann_whitney_audit_query,
        inference.MANN_WHITNEY_AUDIT_ORACLE,
    )
    register(
        "kendall_tau_trend",
        inference.kendall_tau_trend_query,
        inference.KENDALL_TAU_TREND_ORACLE,
    )
    register(
        "spearman_trend",
        inference.spearman_trend_query,
        inference.SPEARMAN_TREND_ORACLE,
    )
    register(
        "cvm_drift_audit",
        inference.cvm_drift_audit_query,
        inference.CVM_DRIFT_AUDIT_ORACLE,
    )
    register(
        "pettitt_changepoint",
        inference.pettitt_changepoint_query,
        inference.PETTITT_CHANGEPOINT_ORACLE,
    )
    register(
        "wilson_ci_segments",
        inference.wilson_ci_segments_query,
        inference.WILSON_CI_SEGMENTS_ORACLE,
    )
    register(
        "eb_rate_shrinkage",
        inference.eb_rate_shrinkage_query,
        inference.EB_RATE_SHRINKAGE_ORACLE,
    )
    register(
        "cramers_v_association",
        inference.cramers_v_association_query,
        inference.CRAMERS_V_ASSOCIATION_ORACLE,
    )
    register(
        "hodges_lehmann_shift",
        inference.hodges_lehmann_shift_query,
        inference.HODGES_LEHMANN_SHIFT_ORACLE,
    )
    register(
        "source_concentration_audit",
        inference.source_concentration_audit_query,
        inference.SOURCE_CONCENTRATION_AUDIT_ORACLE,
    )

    # ---- round 8: embedding-geometry tier ----
    register(
        "embedding_anisotropy_audit",
        retrieval.embedding_anisotropy_audit_query,
        retrieval.EMBEDDING_ANISOTROPY_AUDIT_ORACLE,
    )
    register(
        "twonn_intrinsic_dim",
        retrieval.twonn_intrinsic_dim_query,
        retrieval.TWONN_INTRINSIC_DIM_ORACLE,
    )
    register(
        "mrr_audit",
        retrieval.mrr_audit_query,
        retrieval.MRR_AUDIT_ORACLE,
    )

    # ---- round 8: dedup / span tier ----
    register(
        "multiwidth_span_profile",
        substring_dedup.multiwidth_span_profile_query,
        substring_dedup.MULTIWIDTH_SPAN_PROFILE_ORACLE,
    )
    register(
        "simhash_threshold_sweep",
        dedup.simhash_threshold_sweep_query,
        dedup.SIMHASH_THRESHOLD_SWEEP_ORACLE,
    )
    register(
        "semantic_dedup_keep",
        clustering.semantic_dedup_keep_query,
        clustering.SEMANTIC_DEDUP_KEEP_ORACLE,
    )

    # ---- round 8: layout / mixture / graph tier ----
    register(
        "clustering_depth_audit",
        layout_mod.clustering_depth_audit_query,
        layout_mod.CLUSTERING_DEPTH_AUDIT_ORACLE,
    )
    register(
        "sqrt_temperature_mix",
        sampling.sqrt_temperature_mix_query,
        sampling.SQRT_TEMPERATURE_MIX_ORACLE,
    )
    register(
        "local_clustering_coeff",
        retrieval.local_clustering_coeff_query,
        retrieval.LOCAL_CLUSTERING_COEFF_ORACLE,
    )

    # ---- round 8: calibration / multiple-testing / time-series ----
    register(
        "quantile_normalize_map",
        inference.quantile_normalize_map_query,
        inference.QUANTILE_NORMALIZE_MAP_ORACLE,
    )
    register(
        "bh_fdr_drift_gates",
        inference.bh_fdr_drift_gates_query,
        inference.BH_FDR_DRIFT_GATES_ORACLE,
    )
    register(
        "ljung_box_stat",
        inference.ljung_box_stat_query,
        inference.LJUNG_BOX_STAT_ORACLE,
    )
    register(
        "mann_kendall_trend",
        inference.mann_kendall_trend_query,
        inference.MANN_KENDALL_TREND_ORACLE,
    )
    register(
        "dup_capture_recapture",
        dedup.dup_capture_recapture_query,
        dedup.DUP_CAPTURE_RECAPTURE_ORACLE,
    )
    register(
        "loo_source_sensitivity",
        inference.loo_source_sensitivity_query,
        inference.LOO_SOURCE_SENSITIVITY_ORACLE,
    )
    register(
        "skyline_quality_length",
        curation.skyline_quality_length_query,
        curation.SKYLINE_QUALITY_LENGTH_ORACLE,
    )
    register(
        "split_srm_check",
        sampling.split_srm_check_query,
        sampling.SPLIT_SRM_CHECK_ORACLE,
    )
    register(
        "welch_t_audit",
        inference.welch_t_audit_query,
        inference.WELCH_T_AUDIT_ORACLE,
    )
    register(
        "cochran_armitage_trend",
        inference.cochran_armitage_trend_query,
        inference.COCHRAN_ARMITAGE_TREND_ORACLE,
    )
    register(
        "phash_threshold_sweep",
        multimodal.phash_threshold_sweep_query,
        multimodal.PHASH_THRESHOLD_SWEEP_ORACLE,
    )

    from .operators import pca

    register(
        "pca_top_component",
        pca.pca_top_component_query,
        pca.PCA_TOP_COMPONENT_ORACLE,
    )
    register(
        "hash_bucket_uniformity",
        sampling.hash_bucket_uniformity_query,
        sampling.HASH_BUCKET_UNIFORMITY_ORACLE,
    )
    register(
        "ivf_margin_audit",
        similarity.ivf_margin_audit_query,
        similarity.IVF_MARGIN_AUDIT_ORACLE,
    )
    register(
        "novelty_decay_curve",
        dedup.novelty_decay_curve_query,
        dedup.NOVELTY_DECAY_CURVE_ORACLE,
    )
    register(
        "anova_source_lengths",
        inference.anova_source_lengths_query,
        inference.ANOVA_SOURCE_LENGTHS_ORACLE,
    )
    # round-10 post-freeze additions (R11_MATERIAL): the k-sample
    # completions of the nonparametric ladder and the CUSUM-family
    # sequential drift detector
    register(
        "kruskal_wallis_sources",
        inference.kruskal_wallis_sources_query,
        inference.KRUSKAL_WALLIS_SOURCES_ORACLE,
    )
    register(
        "brown_forsythe_lengths",
        inference.brown_forsythe_lengths_query,
        inference.BROWN_FORSYTHE_LENGTHS_ORACLE,
    )
    register(
        "page_hinkley_drift",
        drift.page_hinkley_drift_query,
        drift.PAGE_HINKLEY_DRIFT_ORACLE,
    )
    register(
        "friedman_event_mix",
        inference.friedman_event_mix_query,
        inference.FRIEDMAN_EVENT_MIX_ORACLE,
    )
    register(
        "wilcoxon_signed_rank",
        inference.wilcoxon_signed_rank_query,
        inference.WILCOXON_SIGNED_RANK_ORACLE,
    )
    register(
        "simplified_silhouette",
        similarity.simplified_silhouette_query,
        similarity.SIMPLIFIED_SILHOUETTE_ORACLE,
    )
    register(
        "centroid_shift_drift",
        similarity.centroid_shift_drift_query,
        similarity.CENTROID_SHIFT_DRIFT_ORACLE,
    )
    register(
        "sample_size_epsilon_plan",
        sampling.sample_size_epsilon_plan_query,
        sampling.SAMPLE_SIZE_EPSILON_PLAN_ORACLE,
    )
    register(
        "label_anisotropy_audit",
        retrieval.label_anisotropy_audit_query,
        retrieval.LABEL_ANISOTROPY_AUDIT_ORACLE,
    )

    # ---- round-8 additions registered AFTER the r08 window froze —
    # r09 window material by construction (tracked in
    # tests/test_registry_window.py R09_MATERIAL) ----
    register(
        "interarrival_burstiness",
        inference.interarrival_burstiness_query,
        inference.INTERARRIVAL_BURSTINESS_ORACLE,
    )
    register(
        "nzv_dimension_audit",
        retrieval.nzv_dimension_audit_query,
        retrieval.NZV_DIMENSION_AUDIT_ORACLE,
    )
    register(
        "theil_sen_ci",
        inference.theil_sen_ci_query,
        inference.THEIL_SEN_CI_ORACLE,
    )
    register(
        "gate_ordering_cost_plan",
        curation.gate_ordering_cost_plan_query,
        curation.GATE_ORDERING_COST_PLAN_ORACLE,
    )
    register(
        "lorenz_curve_points",
        segmentation.lorenz_curve_points_query,
        segmentation.LORENZ_CURVE_POINTS_ORACLE,
    )
    register(
        "new_vs_returning_daily",
        an.new_vs_returning_daily_query,
        an.NEW_VS_RETURNING_DAILY_ORACLE,
    )
    register(
        "js_source_drift",
        drift.js_source_drift_query,
        drift.JS_SOURCE_DRIFT_ORACLE,
    )
    register(
        "good_turing_unseen",
        lexstats.good_turing_unseen_query,
        lexstats.GOOD_TURING_UNSEEN_ORACLE,
    )
    register(
        "cross_correlation_lags",
        inference.cross_correlation_lags_query,
        inference.CROSS_CORRELATION_LAGS_ORACLE,
    )
    register(
        "sprt_daily_decision",
        inference.sprt_daily_decision_query,
        inference.SPRT_DAILY_DECISION_ORACLE,
    )
    register(
        "cuped_uplift",
        drift.cuped_uplift_query,
        drift.CUPED_UPLIFT_ORACLE,
    )
    register(
        "markov_stationary",
        an.markov_stationary_query,
        an.MARKOV_STATIONARY_ORACLE,
    )
    register(
        "hill_tail_index",
        lexstats.hill_tail_index_query,
        lexstats.HILL_TAIL_INDEX_ORACLE,
    )
    register(
        "psi_drift_score",
        dq.psi_drift_score_query,
        dq.PSI_DRIFT_SCORE_ORACLE,
    )
    register(
        "did_uplift",
        drift.did_uplift_query,
        drift.DID_UPLIFT_ORACLE,
    )
    register(
        "burrows_delta",
        lexstats.burrows_delta_query,
        lexstats.BURROWS_DELTA_ORACLE,
    )
    register(
        "detector_cochran_q",
        dedup.detector_cochran_q_query,
        dedup.DETECTOR_COCHRAN_Q_ORACLE,
    )
    register(
        "contrastive_collision",
        clustering.contrastive_collision_query,
        clustering.CONTRASTIVE_COLLISION_ORACLE,
    )
    register(
        "revenue_attribution",
        an.revenue_attribution_query,
        an.REVENUE_ATTRIBUTION_ORACLE,
    )
    register(
        "ncc_confusion",
        similarity.ncc_confusion_query,
        similarity.NCC_CONFUSION_ORACLE,
    )
    register(
        "adamic_adar_links",
        similarity.adamic_adar_links_query,
        similarity.ADAMIC_ADAR_LINKS_ORACLE,
    )
    register(
        "audience_overlap",
        an.audience_overlap_query,
        an.AUDIENCE_OVERLAP_ORACLE,
    )
    register(
        "token_entropy",
        lexstats.token_entropy_query,
        lexstats.TOKEN_ENTROPY_ORACLE,
    )
    register(
        "qq_shift_profile",
        inference.qq_shift_profile_query,
        inference.QQ_SHIFT_PROFILE_ORACLE,
    )
    register(
        "logrank_cohorts",
        inference.logrank_cohorts_query,
        inference.LOGRANK_COHORTS_ORACLE,
    )
    register(
        "smd_balance_audit",
        drift.smd_balance_audit_query,
        drift.SMD_BALANCE_AUDIT_ORACLE,
    )
    register(
        "littles_law_audit",
        an.littles_law_audit_query,
        an.LITTLES_LAW_AUDIT_ORACLE,
    )
    register(
        "binseg_changepoints",
        stats.binseg_changepoints_query,
        stats.BINSEG_CHANGEPOINTS_ORACLE,
    )
    register(
        "discount_elasticity",
        trade.discount_elasticity_query,
        trade.DISCOUNT_ELASTICITY_ORACLE,
    )
    register(
        "cust_order_dist",
        trade.cust_order_dist_query,
        trade.CUST_ORDER_DIST_ORACLE,
    )
    register(
        "promo_revenue_share",
        trade.promo_revenue_share_query,
        trade.PROMO_REVENUE_SHARE_ORACLE,
    )
    register(
        "small_qty_revenue",
        trade.small_qty_revenue_query,
        trade.SMALL_QTY_REVENUE_ORACLE,
    )
    register(
        "branded_basket_revenue",
        trade.branded_basket_revenue_query,
        trade.BRANDED_BASKET_REVENUE_ORACLE,
    )
    register(
        "davies_bouldin",
        similarity.davies_bouldin_query,
        similarity.DAVIES_BOULDIN_ORACLE,
    )
    register(
        "activity_streaks",
        an.activity_streaks_query,
        an.ACTIVITY_STREAKS_ORACLE,
    )
    register(
        "fulfillment_lag",
        trade.fulfillment_lag_query,
        trade.FULFILLMENT_LAG_ORACLE,
    )
    register(
        "cell_label_gini",
        similarity.cell_label_gini_query,
        similarity.CELL_LABEL_GINI_ORACLE,
    )

    # ---- round-9 additions (post-freeze: R10_MATERIAL in
    # tests/test_registry_window.py; capped at 13 per the r08
    # verdict's certification-pipeline pressure rule) ----
    register(
        "tail_token_share",
        lexstats.tail_token_share_query,
        lexstats.TAIL_TOKEN_SHARE_ORACLE,
    )
    register(
        "log_odds_terms",
        lexstats.log_odds_terms_query,
        lexstats.LOG_ODDS_TERMS_ORACLE,
    )
    register(
        "lexicon_gate_audit",
        textops.lexicon_gate_audit_query,
        textops.LEXICON_GATE_AUDIT_ORACLE,
    )
    register(
        "v_measure_cells",
        similarity.v_measure_cells_query,
        similarity.V_MEASURE_CELLS_ORACLE,
    )
    register(
        "recall_at_k_curve",
        similarity.recall_at_k_curve_query,
        similarity.RECALL_AT_K_CURVE_ORACLE,
    )
    register(
        "weighted_median_price",
        stats.weighted_median_price_query,
        stats.WEIGHTED_MEDIAN_PRICE_ORACLE,
    )
    register(
        "participation_ratio",
        pca.participation_ratio_query,
        pca.PARTICIPATION_RATIO_ORACLE,
    )
    register(
        "kendall_w_detectors",
        dedup.kendall_w_detectors_query,
        dedup.KENDALL_W_DETECTORS_ORACLE,
    )

    # ---- round-11 additions (pre-freeze: in _WINDOW_R11): the real
    # synthetic codec replacing the multimodal NotImplementedError
    # stub (r10 verdict ask #5) — decoded-content math value-checked,
    # plus the poison-pill audit at the codec boundary ----
    register(
        "codec_moments",
        codec.codec_moments_query,
        codec.CODEC_MOMENTS_ORACLE,
    )
    register(
        "codec_audit",
        codec.codec_audit_query,
        codec.CODEC_AUDIT_ORACLE,
    )

    # ---- round-11 post-freeze additions (R12_MATERIAL): the ordered/
    # median/effect-size completions of the nonparametric ladder ----
    register(
        "mood_median_test",
        inference.mood_median_test_query,
        inference.MOOD_MEDIAN_TEST_ORACLE,
    )
    register(
        "cliffs_delta_sources",
        inference.cliffs_delta_sources_query,
        inference.CLIFFS_DELTA_SOURCES_ORACLE,
    )
    register(
        "jonckheere_trend",
        inference.jonckheere_trend_query,
        inference.JONCKHEERE_TREND_ORACLE,
    )
    register(
        "durbin_watson_daily",
        stats.durbin_watson_daily_query,
        stats.DURBIN_WATSON_DAILY_ORACLE,
    )
    register(
        "ad_ksample_sources",
        drift.ad_ksample_sources_query,
        drift.AD_KSAMPLE_SOURCES_ORACLE,
    )
    register(
        "fleiss_kappa_detectors",
        dedup.fleiss_kappa_detectors_query,
        dedup.FLEISS_KAPPA_DETECTORS_ORACLE,
    )
    register(
        "dunn_posthoc_sources",
        inference.dunn_posthoc_sources_query,
        inference.DUNN_POSTHOC_SOURCES_ORACLE,
    )
    register(
        "ansari_bradley_halves",
        inference.ansari_bradley_halves_query,
        inference.ANSARI_BRADLEY_HALVES_ORACLE,
    )
    register(
        "cmh_event_value",
        inference.cmh_event_value_query,
        inference.CMH_EVENT_VALUE_ORACLE,
    )
    register(
        "somers_d_priority",
        inference.somers_d_priority_query,
        inference.SOMERS_D_PRIORITY_ORACLE,
    )
    register(
        "lsh_param_plan",
        dedup.lsh_param_plan_query,
        dedup.LSH_PARAM_PLAN_ORACLE,
    )
    register(
        "welch_anova_sources",
        inference.welch_anova_sources_query,
        inference.WELCH_ANOVA_SOURCES_ORACLE,
    )
    register(
        "quade_event_mix",
        inference.quade_event_mix_query,
        inference.QUADE_EVENT_MIX_ORACLE,
    )

    _apply_window(_WINDOW_R12)
    _LOADED = True
