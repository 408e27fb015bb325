"""Physical-plan assertions for the round-8 operators: the properties
each plan must keep at 100 TB (PLANS.md carries the human-readable
trees; these enforce them)."""

from __future__ import annotations

import re

from _kafka_streams_scaffold_spark.operators import (
    clustering,
    curation,
    dedup,
    inference,
    layout,
    pca,
    retrieval,
    sampling,
    similarity,
    substring_dedup,
)
from _kafka_streams_scaffold_spark.plans import inspect as pi


def _n(tree: str, node: str) -> int:
    return len(set(re.findall(rf"(?<![A-Za-z]){node}[^\n(]*\((\d+)\)", tree)))


def _no_python(t: str) -> None:
    assert "BatchEvalPython" not in t and "ArrowEvalPython" not in t


def test_mann_whitney_is_rollup_plus_grid_no_pairs(spark, sf_dir):
    t = pi.tree(inference.mann_whitney_audit_query(spark, sf_dir))
    _no_python(t)
    # pooled midranks live on the value spine: aggregates, a window,
    # no nested-loop/cartesian anywhere
    assert "CartesianProduct" not in t
    assert _n(t, "HashAggregate") >= 2


def test_cvm_fixed_points_before_any_sum(spark, sf_dir):
    t = pi.tree(inference.cvm_drift_audit_query(spark, sf_dir))
    _no_python(t)
    assert "CartesianProduct" not in t
    # corpus rollup + grid cumulative + pair aggregate: at least two
    # aggregate layers (the per-term fixed-point floor lives in the
    # projection; pi.tree elides expressions, so the layer count is
    # the enforceable property)
    assert _n(t, "HashAggregate") >= 2


def test_trend_family_single_day_spine(spark, sf_dir):
    for q in (
        inference.kendall_tau_trend_query,
        inference.spearman_trend_query,
        inference.pettitt_changepoint_query,
        inference.mann_kendall_trend_query,
    ):
        t = pi.tree(q(spark, sf_dir))
        _no_python(t)
        # the corpus is reduced by a hash aggregate before any join
        assert _n(t, "HashAggregate") >= 1


def test_anisotropy_power_sums_no_pair_join(spark, sf_dir):
    for q in (
        retrieval.embedding_anisotropy_audit_query,
        retrieval.label_anisotropy_audit_query,
    ):
        t = pi.tree(q(spark, sf_dir))
        _no_python(t)
        assert _n(t, "SortMergeJoin") == 0
        assert "CartesianProduct" not in t


def test_pca_corpus_touched_once_no_collect_joins(spark, sf_dir):
    t = pi.tree(pca.pca_top_component_query(spark, sf_dir))
    _no_python(t)
    # the power iteration chains broadcast-sized frames; the corpus
    # side appears as Generate (posexplode) + hash aggregates
    assert _n(t, "SortMergeJoin") == 0
    assert "CartesianProduct" not in t


def test_multiwidth_spans_one_scan_three_widths(spark, sf_dir):
    t = pi.tree(substring_dedup.multiwidth_span_profile_query(spark, sf_dir))
    _no_python(t)
    # ONE parquet scan fans out to all widths (the width axis is an
    # exploded literal, not three scans)
    assert t.count("Scan parquet") <= 1
    assert _n(t, "SortMergeJoin") == 0


def test_semantic_keep_single_doc_join_no_python(spark, sf_dir):
    t = pi.tree(clustering.semantic_dedup_keep_query(spark, sf_dir))
    _no_python(t)


def test_clustering_depth_sweep_is_metadata_scale(spark, sf_dir):
    t = pi.tree(layout.clustering_depth_audit_query(spark, sf_dir))
    _no_python(t)
    # the zone frame is built by aggregates; the sweep is windows —
    # the |files|^2 overlap join must NOT appear (oracle-only shape)
    assert _n(t, "SortMergeJoin") <= 1
    assert "CartesianProduct" not in t


def test_skyline_no_pair_join(spark, sf_dir):
    t = pi.tree(curation.skyline_quality_length_query(spark, sf_dir))
    _no_python(t)
    assert "CartesianProduct" not in t


def test_bh_fdr_rides_the_grid(spark, sf_dir):
    t = pi.tree(inference.bh_fdr_drift_gates_query(spark, sf_dir))
    _no_python(t)
    assert "CartesianProduct" not in t


def test_capture_recapture_id_width_joins_only(spark, sf_dir):
    t = pi.tree(dedup.dup_capture_recapture_query(spark, sf_dir))
    _no_python(t)
    assert "CartesianProduct" not in t


def test_silhouette_centroids_broadcast(spark, sf_dir):
    t = pi.tree(similarity.simplified_silhouette_query(spark, sf_dir))
    _no_python(t)
    # the |labels| x dim centroid table must broadcast, never
    # sort-merge against the corpus
    assert _n(t, "SortMergeJoin") == 0


def test_uniformity_and_srm_single_scan(spark, sf_dir):
    for q in (
        sampling.hash_bucket_uniformity_query,
        sampling.split_srm_check_query,
        sampling.sqrt_temperature_mix_query,
        sampling.sample_size_epsilon_plan_query,
    ):
        t = pi.tree(q(spark, sf_dir))
        _no_python(t)
        assert t.count("Scan parquet") <= 1
