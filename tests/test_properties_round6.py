"""Property-based tests for the round-6 operators: engine results
must satisfy structural invariants (and equal an independent Python
model where one is cheap) on arbitrary inputs."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from _kafka_streams_scaffold_spark.operators import curation, sampling

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

SF = "/root/testdata/sf0.001"


def _mk(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


@given(
    chars=st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=40),
    words=st.integers(min_value=1, max_value=5),
)
@settings(**_SETTINGS)
def test_curriculum_pacing_partition_and_monotonicity(
    spark, monkeypatch, chars, words
):
    rows = [
        (i, " ".join(["w"] * words), "en", "s", n)
        for i, n in enumerate(chars)
    ]
    monkeypatch.setattr(curation.tables, "table", lambda *_a: _mk(spark, rows))
    out = sorted(
        curation.curriculum_pacing_query(spark, SF).collect(),
        key=lambda r: r["stage"],
    )
    # stages partition the corpus exactly
    assert sum(r["n_docs"] for r in out) == len(rows)
    assert sum(r["n_tokens"] for r in out) == words * len(rows)
    # cumulative share is nondecreasing and ends at 1000 permille
    pml = [r["cum_token_pml"] for r in out]
    assert pml == sorted(pml)
    assert pml[-1] == 1000


@given(
    weights=st.lists(
        st.integers(min_value=0, max_value=500), min_size=2, max_size=30
    )
)
@settings(**_SETTINGS)
def test_neyman_total_bound_and_zero_variance(spark, monkeypatch, weights):
    # two strata: A constant (sd 0), B from the drawn weights
    rows = [(i, "x", "en", "A", 42) for i in range(5)]
    rows += [
        (100 + i, "x", "en", "B", w) for i, w in enumerate(weights)
    ]
    monkeypatch.setattr(sampling.tables, "table", lambda *_a: _mk(spark, rows))
    out = {r["source"]: r for r in sampling.neyman_allocation_query(spark, SF).collect()}
    if not out:
        # every stratum constant -> undefined allocation, empty result
        assert len(set(weights)) == 1
        return
    assert out["A"]["alloc"] == 0  # zero-variance stratum gets nothing
    assert sum(r["alloc"] for r in out.values()) <= sampling.NEYMAN_TOTAL
    # sd matches the exact population formula
    n = len(weights)
    mean = sum(weights) / n
    sd = math.sqrt(sum((w - mean) ** 2 for w in weights) / n)
    assert math.isclose(out["B"]["sd_chars"], sd, rel_tol=1e-9, abs_tol=1e-9)


@given(ids=st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=300))
@settings(**_SETTINGS)
def test_priority_sample_matches_python_model(spark, monkeypatch, ids):
    rows = [(i, "t", "en", "s", 10) for i in sorted(ids)]
    monkeypatch.setattr(sampling.tables, "table", lambda *_a: _mk(spark, rows))
    out = [
        r["doc_id"]
        for r in sampling.priority_sample_query(spark, SF).collect()
    ]
    pri = {
        i: hashlib.md5(f"ps-v1|{i}".encode()).hexdigest() for i in ids
    }
    expect = sorted(ids, key=lambda i: pri[i])[: sampling.PRIORITY_K]
    assert sorted(out) == sorted(expect)
