"""Round-4 scale-form tier: partition-parallel pareto skyline,
two-pass token-budget selection, two-pass equi-depth histogram —
each proven equal to (or bounded against) its exact twin."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark.operators import (
    analytics,
    sampling,
    sketches,
)


def _brute_skyline(rows):
    out = []
    for r in rows:
        dominated = any(
            o["price_cents"] <= r["price_cents"]
            and o["o_orderdate"] >= r["o_orderdate"]
            and (
                o["price_cents"] < r["price_cents"]
                or o["o_orderdate"] > r["o_orderdate"]
            )
            for o in rows
        )
        if not dominated:
            out.append((r["o_orderkey"], r["price_cents"], r["o_orderdate"]))
    return sorted(out)


def test_pareto_orders_matches_brute_force(spark, monkeypatch):
    """Hand graph with ties in both dimensions: the bucketed skyline
    must equal the O(n^2) definition, including keeping mutually
    non-dominating ties."""
    d = datetime.date
    data = [
        Row(o_orderkey=1, o_totalprice=10.0, o_orderdate=d(2024, 1, 5)),
        Row(o_orderkey=2, o_totalprice=10.0, o_orderdate=d(2024, 1, 5)),
        Row(o_orderkey=3, o_totalprice=12.0, o_orderdate=d(2024, 1, 4)),
        Row(o_orderkey=4, o_totalprice=8.0, o_orderdate=d(2024, 1, 1)),
        Row(o_orderkey=5, o_totalprice=15.0, o_orderdate=d(2024, 1, 9)),
        Row(o_orderkey=6, o_totalprice=15.0, o_orderdate=d(2024, 1, 2)),
        Row(o_orderkey=7, o_totalprice=7.99, o_orderdate=d(2024, 1, 1)),
    ]
    df = spark.createDataFrame(data)
    monkeypatch.setattr(analytics.tables, "table", lambda *a: df)
    got = sorted(
        (r["o_orderkey"], r["price_cents"], r["o_orderdate"])
        for r in analytics.pareto_orders_query(spark, "_").collect()
    )
    base = [
        {
            "o_orderkey": r.o_orderkey,
            "price_cents": int(r.o_totalprice * 100),
            "o_orderdate": r.o_orderdate,
        }
        for r in data
    ]
    assert got == _brute_skyline(base)


def test_pareto_orders_windows_are_partitioned(spark, sf_dir):
    """The row-sized windows must all be partitioned (the round-3 form
    had a global RANGE window -> single-task stage). The only
    unpartitioned window allowed is the PARETO_BUCKETS-row carry."""
    import re

    plan = analytics.pareto_orders_query(spark, sf_dir)._jdf.queryExecution(
    ).optimizedPlan().toString()
    # in-bucket running max and per-price max are partitioned windows
    assert re.search(
        r"windowspecdefinition\(bucket#\d+", plan
    ), "in-bucket running max must be partitioned by bucket"
    assert re.search(
        r"windowspecdefinition\(price_cents#\d+L", plan
    ), "equal-price max must be partitioned by price"


def test_token_budget_2p_equals_exact(spark, sf_dir):
    exact = {
        (r["doc_id"], r["rank"], r["n_tokens"], r["cum_tokens"])
        for r in sampling.token_budget_selection_query(spark, sf_dir).collect()
    }
    twop = {
        (r["doc_id"], r["rank"], r["n_tokens"], r["cum_tokens"])
        for r in sampling.token_budget_selection_2p_query(
            spark, sf_dir
        ).collect()
    }
    assert exact == twop and exact


def test_token_budget_2p_candidate_set_is_budget_bounded(spark, sf_dir):
    """The point of the two-pass form: the exact window's input is
    output-sized. Reconstruct the candidate count and check it's a
    small multiple of the admitted rows, not the corpus."""
    from _kafka_streams_scaffold_spark import tables
    from _kafka_streams_scaffold_spark.operators.textops import (
        quality_score_expr,
        tokens_expr,
    )

    docs = tables.table(spark, sf_dir, "documents")
    n_docs = docs.count()
    admitted = sampling.token_budget_selection_2p_query(
        spark, sf_dir
    ).count()
    feats = docs.select(
        F.size(tokens_expr()).alias("n_tokens"),
        quality_score_expr().alias("q"),
    )
    probs = [i / sampling.TB_BUCKETS for i in range(1, sampling.TB_BUCKETS)]
    bounds = feats.agg(
        F.percentile_approx("q", probs, 10_000).alias("bs")
    ).collect()[0]["bs"]
    per_bucket = {}
    for r in feats.collect():
        # replicate the query's `q > bound` bucket assignment
        b = sum(1 for x in bounds if r["q"] > x)
        per_bucket.setdefault(b, 0)
        per_bucket[b] += r["n_tokens"]
    cum = 0
    cand = 0
    for b in sorted(per_bucket, reverse=True):
        if cum < sampling.TOKEN_BUDGET:
            cand += 1
        cum += per_bucket[b]
    assert cand <= sampling.TB_BUCKETS
    assert cand < sampling.TB_BUCKETS / 2 or n_docs < 100, (
        "candidate buckets should be a small fraction of all buckets"
    )
    assert admitted > 0


def test_equi_depth_2p_bucket_accuracy(spark, sf_dir):
    """Beyond the registered one-row contract: every bucket's depth is
    within the sketch-guaranteed tolerance and the bucketing scan
    partitions the full table."""
    from _kafka_streams_scaffold_spark import tables

    orders = tables.table(spark, sf_dir, "orders")
    n = orders.count()
    probs = [
        i / sketches.EQUI_DEPTH_BUCKETS
        for i in range(1, sketches.EQUI_DEPTH_BUCKETS)
    ]
    bounds = orders.agg(
        F.percentile_approx(
            "o_totalprice", probs, sketches.ED2P_ACCURACY
        ).alias("bs")
    ).collect()[0]["bs"]
    assert len(bounds) == sketches.EQUI_DEPTH_BUCKETS - 1
    counts = []
    prev = None
    rows = sorted(r["o_totalprice"] for r in orders.collect())
    import bisect

    edges = [rows[0] - 1] + list(bounds) + [rows[-1] + 1]
    for lo, hi in zip(edges, edges[1:]):
        counts.append(
            bisect.bisect_right(rows, hi) - bisect.bisect_right(rows, lo)
        )
    target = n / sketches.EQUI_DEPTH_BUCKETS
    tol = target + 2.0 * n / sketches.ED2P_ACCURACY
    assert sum(counts) == n
    assert all(abs(c - target) <= tol for c in counts)
    row = sketches.equi_depth_histogram_2p_query(spark, sf_dir).collect()[0]
    assert row["n_orders"] == n
    assert row["depth_within_bound"] is True


def test_equi_depth_2p_totals_match_exact_form(spark, sf_dir):
    exact = sketches.equi_depth_histogram_query(spark, sf_dir).agg(
        F.sum("n_orders").alias("n"),
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.sum("sum_cents").alias("cents"),
    ).collect()[0]
    two = sketches.equi_depth_histogram_2p_query(spark, sf_dir).collect()[0]
    assert (exact["n"], exact["lo"], exact["hi"], exact["cents"]) == (
        two["n_orders"],
        two["lo"],
        two["hi"],
        two["sum_cents"],
    )
