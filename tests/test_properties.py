"""Property-based tests (hypothesis): engine results must equal an
independent Python-computed model on arbitrary inputs — a different
kind of evidence than golden cases or cross-engine oracles."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import wordcount

_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_wordcount_matches_python_model(spark, lines):
    df = spark.createDataFrame([Row(text=t) for t in lines])
    got = {r["word"]: r["cnt"] for r in wordcount.wordcount(df).collect()}
    model = Counter(
        w for t in lines for w in re.split(r"\W+", t.lower()) if w != ""
    )
    assert got == dict(model)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(
            lambda p: p[0] != p[1]
        ),
        max_size=10,
    )
)
def test_connected_components_matches_union_find(spark, pairs):
    from _kafka_streams_scaffold_spark.operators import clustering

    node_ids = sorted({n for p in pairs for n in p} | {0, 1})
    nodes = spark.createDataFrame([Row(doc_id=n) for n in node_ids])
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs] or [Row(src=0, dst=0)]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in clustering.connected_components(nodes, edges).collect()
    }

    parent = {n: n for n in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    model = {n: find(n) for n in node_ids}
    assert got == model


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 1_000_000), st.booleans()),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_failsafe_partitions_input_exactly(spark, rows):
    """For ANY failure pattern, (good, quarantined) is an exact
    partition of the input: nothing lost, nothing duplicated, errors
    exactly on the rows whose function call raised."""
    from pyspark.sql import types as T

    from _kafka_streams_scaffold_spark.functions import resilience

    @resilience.failsafe(T.LongType())
    def maybe_boom(x, bad):
        if bad:
            raise ValueError(f"boom {x}")
        return x * 2

    df = spark.createDataFrame(
        [Row(x=x, bad=b) for x, b in rows], "x long, bad boolean"
    )
    good, quarantined = resilience.apply_failsafe(
        df, "y", maybe_boom, "x", "bad"
    )
    good_rows = {r["x"]: r["y"] for r in good.collect()}
    bad_rows = {r["x"] for r in quarantined.collect()}
    expect_bad = {x for x, b in rows if b}
    assert bad_rows == expect_bad
    assert good_rows == {x: 2 * x for x, b in rows if not b}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_TEXT, min_size=1, max_size=10))
def test_df_capped_shingles_is_filtered_subset(spark, texts):
    """Capping never invents rows and never keeps a hot shingle: the
    capped set is exactly the original minus shingles whose document
    frequency exceeds the cap (model computed in Python)."""
    from _kafka_streams_scaffold_spark.operators import dedup

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    orig = [(r["doc_id"], r["shingle"]) for r in dedup.shingles(df).collect()]
    capped = {
        (r["doc_id"], r["shingle"])
        for r in dedup.df_capped_shingles(dedup.shingles(df)).collect()
    }
    df_count = Counter(s for _, s in orig)
    expect = {
        (d, s) for d, s in orig if df_count[s] <= dedup.SHINGLE_DF_CAP
    }
    assert capped == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_vocab_coverage_curve_properties(spark, monkeypatch, texts):
    """Coverage is strictly positive, non-decreasing in rank, and hits
    exactly 1.0 when the whole vocabulary fits in the top-N."""
    from _kafka_streams_scaffold_spark.operators import textops

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    rows = sorted(
        textops.vocab_coverage_query(spark, "_").collect(),
        key=lambda r: r["vocab_rank"],
    )
    if not rows:
        return  # no tokens at all
    cov = [r["cum_coverage"] for r in rows]
    assert all(c > 0 for c in cov)
    assert all(a <= b + 1e-12 for a, b in zip(cov, cov[1:] + [1.1]))
    cnts = [r["cnt"] for r in rows]
    assert all(a >= b for a, b in zip(cnts, cnts[1:]))  # ordered by count
    if len(rows) < textops.VOCAB_TOP:
        assert abs(cov[-1] - 1.0) < 1e-12


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.floats(0, 1000).map(lambda x: round(x, 2))),
        min_size=2,
        max_size=40,
    )
)
def test_winsorized_mean_bounded_by_thresholds(spark, monkeypatch, vals):
    """The winsorized mean always lies within [p1, p99], and the
    thresholds are actual data values."""
    from _kafka_streams_scaffold_spark.operators import stats as st_ops

    rows = [
        Row(event_type=f"t{t}", event_id=i, value=float(v))
        for i, (t, v) in enumerate(vals)
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(st_ops.tables, "table", lambda *a: df)
    by_type = {}
    for t, v in vals:
        by_type.setdefault(f"t{t}", []).append(v)
    for r in st_ops.winsorized_event_stats_query(spark, "_").collect():
        vs = by_type[r["event_type"]]
        assert r["p1"] in vs and r["p99"] in vs
        assert r["p1"] <= r["p99"]
        assert r["p1"] - 1e-9 <= r["winsor_mean"] <= r["p99"] + 1e-9
        assert r["n"] == len(vs)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10.0, max_value=10.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_quantize_matches_python_model(spark, monkeypatch, vecs):
    import math

    from _kafka_streams_scaffold_spark.operators import quantize

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )
    monkeypatch.setattr(quantize.tables, "table", lambda *a: df)
    got = {
        r["vec_id"]: (r["scale"], r["q"])
        for r in quantize.embedding_quantize_query(spark, "_").collect()
    }
    for i, v in enumerate(vecs):
        maxabs = max(abs(x) for x in v)
        scale, q_csv = got[i]
        q = [int(c) for c in q_csv.split(",")]
        assert scale == maxabs / 127
        if maxabs == 0.0:
            assert q == [0] * len(v)
        else:
            assert q == [
                int(math.floor(x / maxabs * 127.0 + 0.5)) for x in v
            ]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_novelty_totals_conserve_distinct_shingles(spark, monkeypatch, texts):
    """Sum of n_novel over docs == number of distinct shingles in the
    corpus (every shingle is novel exactly once, in its first doc)."""
    from _kafka_streams_scaffold_spark.operators import dedup

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    monkeypatch.setattr(dedup.tables, "table", lambda *a: df)
    rows = dedup.doc_ngram_novelty_query(spark, "_").collect()
    distinct_shingles = {
        (r["shingle"]) for r in dedup.shingles(df).collect()
    }
    assert sum(r["n_novel"] for r in rows) == len(distinct_shingles)
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_shingles"]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(1, 40), st.integers(1, 20)),
        min_size=1,
        max_size=12,
    )
)
def test_pareto_frontier_matches_brute_force(spark, pts):
    """Skyline window form == brute-force domination check on
    arbitrary (price, day) point sets, including ties."""
    import datetime

    from _kafka_streams_scaffold_spark.operators import analytics as an_mod

    rows = [
        Row(
            o_orderkey=i,
            o_totalprice=float(p),
            o_orderdate=datetime.datetime(2024, 1, 1)
            + datetime.timedelta(days=d),
        )
        for i, (p, d) in enumerate(pts)
    ]
    df = spark.createDataFrame(rows)
    import unittest.mock as mock

    with mock.patch.object(an_mod.tables, "table", lambda *a: df):
        got = sorted(
            r["o_orderkey"]
            for r in an_mod.pareto_orders_query(spark, "_").collect()
        )

    def dominated(i):
        pi, di = pts[i]
        return any(
            (pj <= pi and dj >= di and (pj < pi or dj > di))
            for j, (pj, dj) in enumerate(pts)
            if j != i
        )

    model = sorted(i for i in range(len(pts)) if not dominated(i))
    assert got == model


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(1, 10), st.integers(1, 10)).filter(
            lambda p: p[0] != p[1]
        ),
        max_size=14,
    )
)
def test_kcore_matches_brute_force_peel(spark, raw_pairs):
    """Convergent k-core peel == Python fixpoint peel on arbitrary
    small graphs (including paths deeper than any fixed unroll)."""
    from _kafka_streams_scaffold_spark.operators import clustering

    pairs = sorted({(min(a, b), max(a, b)) for a, b in raw_pairs})
    nodes = list(range(1, 11))
    docs = spark.createDataFrame([Row(doc_id=n) for n in nodes])
    pdf = spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in pairs]
        or [Row(doc_a=1, doc_b=2)][:0],
        schema="doc_a long, doc_b long",
    )
    import unittest.mock as mock

    with mock.patch.object(
        clustering.tables, "table", lambda *a: docs
    ), mock.patch.object(
        clustering, "simhash_pairs_query", lambda *a: pdf
    ):
        got = {
            r["doc_id"]: r["core_degree"]
            for r in clustering.kcore_query(spark, "_").collect()
        }

    # Python fixpoint peel at k=2
    surv = set(nodes)
    while True:
        deg = {n: 0 for n in surv}
        for a, b in pairs:
            if a in surv and b in surv:
                deg[a] += 1
                deg[b] += 1
        nxt = {n for n in surv if deg[n] >= clustering.KCORE_K}
        if nxt == surv:
            break
        surv = nxt
    model = {}
    for a, b in pairs:
        if a in surv and b in surv:
            model[a] = model.get(a, 0) + 1
            model[b] = model.get(b, 0) + 1
    assert got == model
