"""Property-based tests for the round-5 late operators: engine
results must equal an independent Python-computed model on arbitrary
inputs (the prefix-filter completeness proof, the largest-remainder
apportionment contract, winnowing's selection rule, the t-closeness
EMD, and the epoch-interleave permutation)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import dedup, sampling

# small words so random docs actually share shingles
_WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_DOC = st.lists(_WORD, min_size=0, max_size=10).map(" ".join)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
            for i, t in enumerate(texts)
        ]
    )


def _shingle_set(text: str) -> set:
    toks = [w for w in re.split(r"\W+", text.lower()) if w]
    return {
        " ".join(toks[i : i + dedup.SHINGLE_N])
        for i in range(len(toks) - dedup.SHINGLE_N + 1)
    }


@settings(**_SETTINGS)
@given(st.lists(_DOC, min_size=2, max_size=6))
def test_prefix_filter_matches_brute_force_tau_join(spark, texts):
    """The completeness property: the prefix-filtered join must emit
    EXACTLY the pairs the naive all-pairs tau-join emits."""
    docs = _mkdocs(spark, texts)
    real = dedup.tables.table
    dedup.tables.table = lambda *a: docs
    try:
        got = {
            (r["doc_a"], r["doc_b"]): (r["jac_num"], r["jac_den"])
            for r in dedup.prefix_filter_pairs_query(spark, "_").collect()
        }
    finally:
        dedup.tables.table = real
    sets = {i: _shingle_set(t) for i, t in enumerate(texts)}
    expect = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                i = len(sets[a] & sets[b])
                sa, sb = len(sets[a]), len(sets[b])
                # i/(sa+sb-i) >= 4/5  <=>  9i >= 4(sa+sb)
                if 9 * i >= 4 * (sa + sb):
                    expect[(a, b)] = (i, sa + sb - i)
    assert got == expect


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=8))
def test_budget_allocation_matches_hamilton_model(spark, weights):
    """Largest-remainder apportionment: exact floor+leftover model."""
    total = sum(weights)
    if total == 0:
        weights = [w + 1 for w in weights]  # degenerate: no mass at all
        total = sum(weights)
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="x", lang="en", source=f"s{i:02d}", n_chars=w)
            for i, w in enumerate(weights)
        ]
    )
    real = sampling.tables.table
    sampling.tables.table = lambda *a: docs
    try:
        got = {
            r["source"]: r["alloc"]
            for r in sampling.budget_allocation_query(spark, "_").collect()
        }
    finally:
        sampling.tables.table = real
    B = sampling.ALLOCATION_BUDGET
    floors = {f"s{i:02d}": B * w // total for i, w in enumerate(weights)}
    rems = {f"s{i:02d}": (B * w) % total for i, w in enumerate(weights)}
    leftover = B - sum(floors.values())
    order = sorted(rems, key=lambda s: (-rems[s], s))
    expect = dict(floors)
    for s in order[:leftover]:
        expect[s] += 1
    assert got == expect
    assert sum(got.values()) == B


@settings(**_SETTINGS)
@given(st.lists(_WORD, min_size=0, max_size=20).map(" ".join))
def test_winnowing_matches_python_model(spark, text):
    docs = _mkdocs(spark, [text])
    real = dedup.tables.table
    dedup.tables.table = lambda *a: docs
    try:
        rows = dedup.winnowing_fingerprints_query(spark, "_").collect()
    finally:
        dedup.tables.table = real
    toks = [w for w in re.split(r"\W+", text.lower()) if w]
    grams = [
        " ".join(toks[i : i + dedup.SHINGLE_N])
        for i in range(len(toks) - dedup.SHINGLE_N + 1)
    ]

    def h60(s: str) -> int:
        d = hashlib.md5(f"{dedup._WINNOW_SEED}:{s}".encode()).hexdigest()
        return int(d[:15], 16)

    hs = [h60(g) for g in grams]
    w = dedup.WINNOW_W
    fps = {
        min(hs[i : i + w]) for i in range(len(hs) - w + 1)
    }
    if not fps:
        assert rows == []
        return
    r = rows[0]
    assert r["n_grams"] == len(grams)
    assert r["n_fingerprints"] == len(fps)
    assert r["min_fp"] == min(fps)
    assert r["fp_checksum"] == sum(f % 1000000007 for f in fps)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 3)),
        min_size=1,
        max_size=12,
    )
)
def test_t_closeness_matches_emd_model(spark, rows_in):
    from _kafka_streams_scaffold_spark.operators import dq

    cust = spark.createDataFrame(
        [
            Row(
                c_custkey=i,
                c_name="x",
                c_nationkey=nk,
                c_acctbal=bucket * 2000.0 + 100.0,
                c_mktsegment="A",
            )
            for i, (nk, bucket) in enumerate(rows_in)
        ]
    )
    real = dq.tables.table
    dq.tables.table = lambda *a: cust
    try:
        got = {
            (r["c_nationkey"], r["c_mktsegment"]): (r["t_num"], r["t_den"])
            for r in dq.t_closeness_audit_query(spark, "_").collect()
        }
    finally:
        dq.tables.table = real
    buckets = sorted({b for _, b in rows_in})
    m = len(buckets)
    n = len(rows_in)
    glob = Counter(b for _, b in rows_in)
    classes = {}
    for nk, b in rows_in:
        classes.setdefault(nk, Counter())[b] += 1
    expect = {}
    for nk, dist in classes.items():
        n_c = sum(dist.values())
        cum, abs_sum = 0, 0
        for b in buckets:
            cum += dist.get(b, 0) * n - glob[b] * n_c
            abs_sum += abs(cum)
        expect[(nk, "A")] = (abs_sum, (m - 1) * n_c * n)
    assert got == expect


@settings(**_SETTINGS)
@given(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12)
)
def test_epoch_interleave_permutation_property(spark, sources):
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="x", lang="en", source=s, n_chars=1)
            for i, s in enumerate(sources)
        ]
    )
    real = sampling.tables.table
    sampling.tables.table = lambda *a: docs
    try:
        rows = sampling.epoch_interleave_query(spark, "_").collect()
    finally:
        sampling.tables.table = real
    assert len(rows) == len(sources)
    assert len({r["global_pos"] for r in rows}) == len(rows)
    n_sources = len(set(sources))
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["shuffle_rank"])
    src_rank = {s: i + 1 for i, s in enumerate(sorted(by_src))}
    for s, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    for r in rows:
        assert (
            r["global_pos"]
            == (r["shuffle_rank"] - 1) * n_sources + src_rank[r["source"]]
        )
