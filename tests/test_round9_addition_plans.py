"""Physical-plan assertions for the round-9 post-freeze additions
(R10_MATERIAL): the properties each plan must keep at 100 TB.

These use ``elide_cached=False`` trees: the pinned rollups sit in a
LEFT branch here, and the property that matters is that every
InMemoryRelation reference shares ONE cached build — visible as a
single distinct `Scan parquet` node id across the whole tree."""

from __future__ import annotations

import re

from _kafka_streams_scaffold_spark.operators import (
    lexstats,
    similarity,
    stats,
    textops,
)
from _kafka_streams_scaffold_spark import pinning
from _kafka_streams_scaffold_spark.plans import inspect as pi


import pytest


@pytest.fixture(autouse=True)
def _full_lineage_pins():
    """Round-12 (r11 ADVICE): these plan assertions audit PIN reads;
    checkpoint-mode pins render the same 'Scan ExistingRDD' leaf as
    any localCheckpoint, which made reads_pinned vacuous. Persist-mode
    pins render InMemoryTableScan distinguishably, so every test in
    this module runs under full-lineage pins (the audited logical
    query surface is identical in both modes)."""
    from _kafka_streams_scaffold_spark import pinning

    with pinning.full_lineage():
        yield


def _n(tree: str, node: str) -> int:
    return len(set(re.findall(rf"(?<![A-Za-z]){node}[^\n(]*\((\d+)\)", tree)))


def _no_python(t: str) -> None:
    assert "BatchEvalPython" not in t and "ArrowEvalPython" not in t


def test_tail_share_one_scan_broadcast_anti_head(spark, sf_dir):
    with pinning.full_lineage():
        t = pi.tree(
            lexstats.tail_token_share_query(spark, sf_dir),
            elide_cached=False,
        )
    _no_python(t)
    # the (source, term) rollup is pinned: totals, the head and the
    # anti-probe all read ONE cached build — exactly one parquet scan
    # node id in the whole tree, and the explode lives inside it
    # (<= 2 distinct Generate ids: the cached build's final+initial
    # AQE variants)
    assert pi.reads_pinned(t)  # pinned artifact read, not re-derived
    assert _n(t, "Scan parquet") == 1
    assert _n(t, "Generate") <= 2
    # the constant-size head enters the tail filter as a broadcast
    # LEFT ANTI — never a shuffle keyed on the vocabulary
    assert "LeftAnti" in t and "BroadcastExchange" in t
    assert "TakeOrderedAndProject" in t
    assert "SortMergeJoin" not in t


def test_log_odds_grid_one_scan_broadcast_built(spark, sf_dir):
    with pinning.full_lineage():
        t = pi.tree(
            lexstats.log_odds_terms_query(spark, sf_dir), elide_cached=False
        )
    _no_python(t)
    assert pi.reads_pinned(t)  # pinned artifact read, not re-derived
    assert _n(t, "Scan parquet") == 1
    assert _n(t, "Generate") <= 2
    # the sources x vocabulary grid comes from broadcasting the
    # |sources| totals onto the vocab frame; the grand total is a
    # broadcast scalar — no shuffle grows with the grid
    assert "BroadcastNestedLoopJoin" in t
    assert "SortMergeJoin" not in t


def test_lexicon_gate_is_one_scan_no_explode_shuffle(spark, sf_dir):
    t = pi.tree(textops.lexicon_gate_audit_query(spark, sf_dir))
    _no_python(t)
    # hit counting happens inside the document row (size/filter on the
    # token array) — no Generate, no join, one map-side-combinable agg
    assert "Generate" not in t
    assert "Join" not in t
    assert _n(t, "HashAggregate") >= 1


def test_v_measure_single_assignment_dimension_rollups(spark, sf_dir):
    with pinning.full_lineage():
        t = pi.tree(
            similarity.v_measure_cells_query(spark, sf_dir),
            elide_cached=False,
        )
    _no_python(t)
    # the (cell, label) joint rollup is pinned; cells/labels/grand
    # totals broadcast back onto it
    assert pi.reads_pinned(t)  # pinned artifact read, not re-derived
    assert "SortMergeJoin" not in t
    assert "BroadcastNestedLoopJoin" in t or "BroadcastHashJoin" in t


def test_recall_curve_no_corpus_rescan_pairs(spark, sf_dir):
    t = pi.tree(similarity.recall_at_k_curve_query(spark, sf_dir))
    _no_python(t)
    # both rankings are bounded |queries| x TOP_K frames; the k-axis
    # explode runs on that bounded frame, never on the corpus, and no
    # unbounded cartesian appears
    assert "CartesianProduct" not in t


def test_weighted_median_window_runs_on_compressed_points(spark, sf_dir):
    df = stats.weighted_median_price_query(spark, sf_dir)
    t = pi.tree(df)
    _no_python(t)
    # The running-sum window must consume the (flag, cents) AGGREGATE,
    # never raw lineitem — walk the Window node's OWN child chain (the
    # indented lines under it, until indentation returns to its level)
    # and require a HashAggregate in that subtree before any parquet
    # scan. A flat substring search would pass on the totals branch's
    # aggregate even if the window regressed to corpus-sized input.
    lines = t.split("\n")
    win_i = next(
        i for i, ln in enumerate(lines) if ln.lstrip(" :+-*").startswith("Window")
    )
    win_indent = len(lines[win_i]) - len(lines[win_i].lstrip(" :+-*"))
    subtree = []
    for ln in lines[win_i + 1 :]:
        ind = len(ln) - len(ln.lstrip(" :+-*"))
        if ln.strip() and ind <= win_indent:
            break
        subtree.append(ln)
    agg_i = next(
        (i for i, ln in enumerate(subtree) if "HashAggregate" in ln), None
    )
    scan_i = next(
        (i for i, ln in enumerate(subtree) if "Scan parquet" in ln), None
    )
    assert agg_i is not None, "window input is not pre-aggregated"
    assert scan_i is None or agg_i < scan_i, (
        "window reads the corpus before aggregating"
    )
    # totals broadcast back onto the crossing filter
    assert "BroadcastHashJoin" in t
    assert "SortMergeJoin" not in t


def test_participation_ratio_one_pass_no_smj(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import pca

    with pinning.full_lineage():
        t = pi.tree(
            pca.participation_ratio_query(spark, sf_dir), elide_cached=False
        )
    _no_python(t)
    # one corpus scan into the pinned d^2 moment rollup; trace and
    # Frobenius folds read the cache; marginals broadcast
    assert _n(t, "Scan parquet") == 1
    assert "SortMergeJoin" not in t
    assert pi.reads_pinned(t)  # pinned artifact read, not re-derived


def test_kendall_w_no_cartesian_no_python(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import dedup

    t = pi.tree(dedup.kendall_w_detectors_query(spark, sf_dir))
    _no_python(t)
    # the tiers axis enters as a 4-row broadcast; the only wide work
    # is the detectors' own banded pair generation (shared pins)
    assert "CartesianProduct" not in t
