"""Round-6 operator unit tests (golden values on synthetic frames).

Each operator also has a registry entry + DuckDB oracle; these tests
pin the SEMANTICS on frames small enough to verify by hand, which the
oracle equality alone cannot do (both engines could share a bug).
"""

from __future__ import annotations

import math

from pyspark.sql import types as T

from _kafka_streams_scaffold_spark.operators import dq, sampling

SF = "/root/testdata/sf0.001"

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, n) for i, t, s, n in rows], DOC_SCHEMA
    )


def test_priority_sample_is_bottom_k_and_stable(spark, monkeypatch):
    rows = [(i, f"doc {i}", "web", 100) for i in range(500)]
    df = _docs(spark, rows)
    monkeypatch.setattr(sampling.tables, "table", lambda *_a: df)
    out = sampling.priority_sample_query(spark, SF).collect()
    assert len(out) == sampling.PRIORITY_K
    # deterministic: rerun yields the same ids
    again = sampling.priority_sample_query(spark, SF).collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in again}
    # bottom-k property: every selected priority <= every excluded one
    max_sel = max(r["priority"] for r in out)
    sel = {r["doc_id"] for r in out}
    import hashlib

    for i, *_rest in rows:
        h = hashlib.md5(f"ps-v1|{i}".encode()).hexdigest()
        if i not in sel:
            assert h >= max_sel


def test_priority_sample_merge_property(spark, monkeypatch):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
    mergeability that makes the sample partial-aggregatable."""
    import hashlib

    ids = list(range(1000))
    pri = {i: hashlib.md5(f"ps-v1|{i}".encode()).hexdigest() for i in ids}
    k = sampling.PRIORITY_K
    full = set(sorted(ids, key=lambda i: pri[i])[:k])
    a, b = ids[:500], ids[500:]
    bka = sorted(a, key=lambda i: pri[i])[:k]
    bkb = sorted(b, key=lambda i: pri[i])[:k]
    merged = set(sorted(bka + bkb, key=lambda i: pri[i])[:k])
    assert merged == full


def test_neyman_allocation_favors_high_variance_stratum(spark, monkeypatch):
    # stratum A: constant lengths (sd 0) -> zero allocation;
    # stratum B: high variance -> gets everything
    rows = [(i, "x", "A", 100) for i in range(10)]
    rows += [(100 + i, "x", "B", 10 + 200 * (i % 2)) for i in range(10)]
    df = _docs(spark, rows)
    monkeypatch.setattr(sampling.tables, "table", lambda *_a: df)
    out = {
        r["source"]: r for r in sampling.neyman_allocation_query(spark, SF).collect()
    }
    assert out["A"]["sd_chars"] == 0.0
    assert out["A"]["alloc"] == 0
    assert out["B"]["alloc"] == sampling.NEYMAN_TOTAL
    # population sd of {10, 210} repeated: mean 110, sd 100
    assert math.isclose(out["B"]["sd_chars"], 100.0, rel_tol=1e-12)


def test_neyman_allocation_all_constant_emits_nothing(spark, monkeypatch):
    df = _docs(spark, [(i, "x", "A", 50) for i in range(5)])
    monkeypatch.setattr(sampling.tables, "table", lambda *_a: df)
    assert sampling.neyman_allocation_query(spark, SF).count() == 0


def test_dp_topk_release_selects_by_noisy_count(spark):
    out = dq.dp_topk_release_query(spark, SF).collect()
    assert len(out) == dq.DP_TOPK_K
    # the release is sorted by noisy count; true_n stays plausible
    # (noise is Laplace(1/eps), fixed-pointed at 1e-6)
    for r in out:
        assert abs(r["noisy_n"] - r["true_n"]) < 50.0  # eps=1 tail bound
        assert r["noisy_n"] == (r["true_n"] * 1_000_000 + r["noise_fp"]) / 1e6


def test_dp_topk_noise_is_keyed_and_deterministic(spark):
    a = dq.dp_topk_release_query(spark, SF).collect()
    b = dq.dp_topk_release_query(spark, SF).collect()
    assert [(r["event_type"], r["noise_fp"]) for r in a] == [
        (r["event_type"], r["noise_fp"]) for r in b
    ]
    # different types draw different noise (keyed hash, not one draw)
    assert len({r["noise_fp"] for r in a}) > 1
