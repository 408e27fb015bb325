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


def test_curriculum_pacing_golden(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import curation

    rows = [
        (1, "a b c", "s", 100),    # stage1 (<200), 3 tokens
        (2, "d e", "s", 300),      # stage2, 2 tokens
        (3, "f g h i", "s", 500),  # stage3, 4 tokens
        (4, "j", "s", 900),        # stage4, 1 token
    ]
    df = _docs(spark, rows)
    monkeypatch.setattr(curation.tables, "table", lambda *_a: df)
    out = {r["stage"]: r for r in curation.curriculum_pacing_query(spark, SF).collect()}
    assert set(out) == {"stage1", "stage2", "stage3", "stage4"}
    assert out["stage1"]["n_tokens"] == 3
    assert out["stage1"]["cum_token_pml"] == 300  # 3/10
    assert out["stage3"]["cum_token_pml"] == 900  # (3+2+4)/10
    assert out["stage4"]["cum_token_pml"] == 1000
    assert out["stage2"]["mean_chars"] == 300.0


def test_conformal_coverage_guarantee_on_real_data(spark):
    """The distribution-free bound: per-type coverage should sit near
    (usually above) 1 - alpha = 0.9; assert a loose finite-sample
    floor so a broken quantile (e.g. off-by-one rank) fails loudly."""
    from _kafka_streams_scaffold_spark.operators import stats

    rows = stats.conformal_coverage_audit_query(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    for r in rows:
        assert r["n_cal"] > 0 and r["q_hat"] >= 0.0
        if r["n_test"] >= 50:
            assert r["coverage"] >= 0.8, r


def test_conformal_k_is_exact_order_statistic(spark, monkeypatch):
    """9 calibration residuals, alpha=0.1 -> k = ceil(0.9*10) = 9 =
    the MAX residual; coverage on a test point just inside it is 1."""
    from pyspark.sql import types as TT

    from _kafka_streams_scaffold_spark.operators import stats

    schema = TT.StructType(
        [
            TT.StructField("event_id", TT.LongType()),
            TT.StructField("event_type", TT.StringType()),
            TT.StructField("value", TT.DoubleType()),
        ]
    )
    # find ids landing in each split for the fixed hash
    import hashlib

    def bkt(i):
        return int(hashlib.md5(f"conf-v1|{i}".encode()).hexdigest()[:4], 16) % 100

    train = [i for i in range(10000) if bkt(i) < 80][:20]
    calib = [i for i in range(10000) if 80 <= bkt(i) < 90][:9]
    test = [i for i in range(10000) if bkt(i) >= 90][:1]
    rows = [(i, "t", 10.0) for i in train]
    rows += [(i, "t", 10.0 + k + 1) for k, i in enumerate(calib)]  # r=1..9
    rows += [(i, "t", 18.5) for i in test]  # |18.5-10| = 8.5 < q=9
    df = spark.createDataFrame(rows, schema)
    monkeypatch.setattr(stats.tables, "table", lambda *_a: df)
    out = stats.conformal_coverage_audit_query(spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_cal"] == 9
    assert r["q_hat"] == 9.0  # k = min(ceil(0.9*10), 9) = 9 -> max resid
    assert r["n_test"] == 1 and r["n_covered"] == 1 and r["coverage"] == 1.0


def test_minhash_estimate_audit_error_bound(spark):
    """Estimator sanity on real data: every candidate pair's estimate
    is within the worst plausible deviation for 32 hashes, and at
    least one pair estimates its exact jaccard closely."""
    from _kafka_streams_scaffold_spark.operators import dedup

    rows = dedup.minhash_estimate_audit_query(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["est_matches"] <= dedup.N_HASHES
        assert abs(r["est_jaccard"] - r["exact_jaccard"]) == r["abs_err"]
    assert min(r["abs_err"] for r in rows) <= 0.15


def test_mmr_rerank_prefers_diversity_over_redundancy(spark, monkeypatch):
    """Three near-identical top vectors + one diverse: plain top-2
    would take two twins; MMR step 2 must pick the diverse one."""
    import pyspark.sql.types as TT

    from _kafka_streams_scaffold_spark import tables as tb
    from _kafka_streams_scaffold_spark.operators import similarity

    dim = tb.EMBED_DIM
    q = [1.0] * dim
    twin_a = [1.0] * (dim - 1) + [0.9]  # cosine ~1 to q AND to twin_b
    twin_b = [1.0] * (dim - 1) + [0.0]
    # moderately relevant (cos 0.75 to q) but clearly less redundant
    # with twin_a than twin_b is
    diverse = [-1.0] * 8 + [1.0] * (dim - 8)
    schema = TT.StructType(
        [
            TT.StructField("vec_id", TT.LongType()),
            TT.StructField("embedding", TT.ArrayType(TT.FloatType())),
            TT.StructField("label", TT.IntegerType()),
        ]
    )
    df = spark.createDataFrame(
        [(0, q, 0), (100, twin_a, 0), (101, twin_b, 0), (102, diverse, 0)],
        schema,
    )
    monkeypatch.setattr(similarity.tables, "table", lambda *_a: df)
    out = similarity.mmr_rerank_query(spark, SF).collect()
    by_step = {r["step"]: r for r in out if r["q_id"] == 0}
    assert by_step[1]["vec_id"] == 100  # most relevant first
    assert by_step[2]["vec_id"] == 102  # diversity beats the twin
    assert by_step[3]["vec_id"] == 101
    assert by_step[1]["mmr_score"] == 0.5 * by_step[1]["rel"]
    # later scores penalized by similarity to the chosen set
    assert by_step[3]["mmr_score"] < 0.5 * by_step[3]["rel"]


def test_mmr_rerank_emits_k_steps_per_query(spark):
    from _kafka_streams_scaffold_spark.operators import similarity

    rows = similarity.mmr_rerank_query(spark, SF).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r["step"])
    assert len(per_q) == similarity.N_QUERIES
    for steps in per_q.values():
        assert sorted(steps) == list(range(1, similarity.MMR_K + 1))
    # no vec repeats within a query
    for q in per_q:
        picks = [r["vec_id"] for r in rows if r["q_id"] == q]
        assert len(picks) == len(set(picks))


def test_payload_phash_blocks_and_pigeonhole(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import multimodal

    base = "A" * 32 + "z" * 32          # half low, half high bytes
    near = "A" * 32 + "z" * 31 + "A"    # flips a few bits at the tail
    far = ("Az" * 32)                   # alternating -> different grid
    rows = [
        (1, base, "s", 64),
        (2, near, "s", 64),
        (3, far, "s", 64),
        (4, "short", "s", 5),           # < grid -> no fingerprint
    ]
    df = _docs(spark, rows)
    monkeypatch.setattr(multimodal.tables, "table", lambda *_a: df)
    fps = {r["doc_id"]: r for r in multimodal.payload_phash_query(spark, SF).collect()}
    assert set(fps) == {1, 2, 3}
    # mean-threshold: 'z' bytes above mean -> block bits set
    assert fps[1]["b0"] == 0 and fps[1]["b4"] == 0xFF
    # base vs near differ in few bits; base vs far in many
    def ham(x, y):
        return sum(
            bin(fps[x][f"b{i}"] ^ fps[y][f"b{i}"]).count("1")
            for i in range(8)
        )

    assert 0 < ham(1, 2) <= multimodal.PHASH_HAM_MAX
    assert ham(1, 3) > multimodal.PHASH_HAM_MAX

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in multimodal.phash_dup_pairs_query(spark, SF).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == ham(1, 2)
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_phash_blocking_is_lossless_under_threshold(spark):
    """Pigeonhole check on real data: every pair within PHASH_HAM_MAX
    must be found by block-equality candidates — verify by brute
    force over the (small) fingerprint table."""
    from _kafka_streams_scaffold_spark.operators import multimodal

    fps = multimodal.payload_phash_query(spark, SF).collect()
    found = {
        (r["doc_a"], r["doc_b"])
        for r in multimodal.phash_dup_pairs_query(spark, SF).collect()
    }
    by_id = {r["doc_id"]: [r[f"b{i}"] for i in range(8)] for r in fps}
    ids = sorted(by_id)
    missed = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = sum(bin(x ^ y).count("1") for x, y in zip(by_id[a], by_id[b]))
            if h <= multimodal.PHASH_HAM_MAX and (a, b) not in found:
                missed.append((a, b, h))
    assert not missed


def test_linkage_entities_fold_matches_into_components(spark):
    """Real-data invariants: every entity has >= 2 members, a positive
    max score (the match decision), and entity ids are member minima
    (canonical representative convention)."""
    from _kafka_streams_scaffold_spark.operators import linkage

    ents = linkage.linkage_entities_query(spark, SF).collect()
    assert ents
    for e in ents:
        assert e["n_members"] >= 2
        assert e["n_sources"] >= 1
        assert e["max_score"] > 0.0
    # entities are disjoint by construction (CC ids are min member ids)
    assert len({e["entity_id"] for e in ents}) == len(ents)


def test_linkage_entities_transitivity(spark):
    """a~b and b~c matched => one entity of >= 3: check the component
    fold against the raw pairwise matches."""
    from _kafka_streams_scaffold_spark.operators import linkage

    matches = [
        (r["doc_a"], r["doc_b"])
        for r in linkage.fs_linkage_scores_query(spark, SF).collect()
        if r["fs_score"] > 0
    ]
    # union-find over the pairs
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in matches:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    sizes: dict[int, int] = {}
    for x in parent:
        sizes[find(x)] = sizes.get(find(x), 0) + 1
    expected = {root: n for root, n in sizes.items() if n > 1}
    ents = {
        e["entity_id"]: e["n_members"]
        for e in linkage.linkage_entities_query(spark, SF).collect()
    }
    assert ents == expected


def _hilbert_ref(x, y):
    """Classic xy2d (Wikipedia iterative form) — the ground truth the
    SQL level chain must reproduce."""
    from _kafka_streams_scaffold_spark.operators.layout import HB_BITS, HB_N

    d = 0
    s = HB_N // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = HB_N - 1 - x
                y = HB_N - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_transform_is_a_bijection():
    from _kafka_streams_scaffold_spark.operators.layout import HB_N

    seen = {
        _hilbert_ref(x, y) for x in range(HB_N) for y in range(HB_N)
    }
    assert seen == set(range(HB_N * HB_N))


def test_hilbert_sql_chain_matches_reference(spark, monkeypatch):
    """Feed a grid whose normalization is the identity (corners pinned
    at 0 and HB_N-1) and compare bucket histograms with the pure-
    Python reference."""
    import pyspark.sql.types as TT

    from _kafka_streams_scaffold_spark.operators import layout

    n = layout.HB_N
    pts = [(x, y) for x in range(0, n, 15) for y in range(0, n, 15)]
    pts += [(0, 0), (n - 1, n - 1), (0, n - 1), (n - 1, 0)]
    import datetime as dt

    epoch = dt.date(1970, 1, 1)
    schema = TT.StructType(
        [
            TT.StructField("o_custkey", TT.LongType()),
            TT.StructField("o_orderdate", TT.TimestampType()),
        ]
    )
    rows = [
        (x, dt.datetime.combine(epoch + dt.timedelta(days=y), dt.time()))
        for x, y in pts
    ]
    df = spark.createDataFrame(rows, schema)
    monkeypatch.setattr(layout.tables, "table", lambda *_a: df)
    out = layout.hilbert_layout_query(spark, SF).collect()
    shift = 2 * layout.HB_BITS - layout.HB_PREFIX_BITS
    expected = {}
    for x, y in pts:
        b = _hilbert_ref(x, y) >> shift
        expected[b] = expected.get(b, 0) + 1
    got = {r["hbucket"]: r["n_rows"] for r in out}
    assert got == expected


def test_hilbert_locality_not_worse_than_zorder(spark):
    """The reason to prefer Hilbert: bucket spans (what zone maps
    prune on) should be no worse than Morton's on average."""
    from _kafka_streams_scaffold_spark.operators import layout

    def mean_span(rows, lo, hi):
        spans = [r[hi] - r[lo] for r in rows]
        return sum(spans) / len(spans)

    h = layout.hilbert_layout_query(spark, "/root/testdata/sf0.01").collect()
    z = layout.zorder_layout_query(spark, "/root/testdata/sf0.01").collect()
    assert mean_span(h, "custkey_lo", "custkey_hi") <= 1.15 * mean_span(
        z, "custkey_lo", "custkey_hi"
    )
    assert mean_span(h, "day_lo", "day_hi") <= 1.15 * mean_span(
        z, "day_lo", "day_hi"
    )


def test_dedup_token_savings_golden(spark, monkeypatch):
    """Two exact twins (minhash/ngram/edit catch them) + one unique:
    the dropped doc's tokens are the savings; tiers that fire agree."""
    from _kafka_streams_scaffold_spark.operators import dedup

    twin = "the quick brown fox jumps over the lazy dog " * 5
    rows = [
        (1, twin, "s", len(twin)),
        (2, twin, "s", len(twin)),
        (3, "completely different words entirely here", "s", 40),
    ]
    df = _docs(spark, rows)
    monkeypatch.setattr(dedup.tables, "table", lambda *_a: df)
    out = {r["tier"]: r for r in dedup.dedup_token_savings_query(spark, SF).collect()}
    assert set(out) == {"simhash", "minhash", "ngram", "edit"}
    twin_tokens = len(twin.split())
    total = twin_tokens * 2 + 5
    for tier in ("minhash", "ngram"):
        r = out[tier]
        assert r["n_docs_dropped"] == 1
        assert r["tokens_dropped"] == twin_tokens
        assert r["tokens_total"] == total
        assert r["savings_pml"] == 1000 * twin_tokens // total


def test_weighted_priority_sample_reference_and_invariance(spark, monkeypatch):
    """Exact golden vs a pure-Python Efraimidis-Spirakis reference
    with the same md5 arithmetic, plus the scale-invariance property
    (multiplying all weights by a constant preserves the selection)."""
    import hashlib
    import math as m

    def race(i, w):
        h = int(hashlib.md5(f"wps-v1|{i}".encode()).hexdigest()[:8], 16)
        neg_ln_fp = m.floor(1e12 * (-m.log((2.0 * h + 1.0) / 8589934592.0)))
        return neg_ln_fp / w

    rows = [(i, "x", "s", 10 + (i % 7) * 50) for i in range(400)]
    df = _docs(spark, rows)
    monkeypatch.setattr(sampling.tables, "table", lambda *_a: df)
    out = sampling.weighted_priority_sample_query(spark, SF).collect()
    assert len(out) == sampling.WPS_K
    ref = sorted(rows, key=lambda r: (race(r[0], r[3]), r[0]))[: sampling.WPS_K]
    assert [r["doc_id"] for r in out] == [i for i, *_ in ref]
    # scale invariance: E_i/c reorders identically
    rows2 = [(i, t, s, w * 3) for i, t, s, w in rows]
    df2 = _docs(spark, rows2)
    monkeypatch.setattr(sampling.tables, "table", lambda *_a: df2)
    out2 = sampling.weighted_priority_sample_query(spark, SF).collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in out2}


def test_weighted_priority_sample_favors_heavy_docs(spark, monkeypatch):
    """Statistical sanity at the population level: the selected set's
    mean weight must exceed the corpus mean (inclusion prob ∝ w)."""
    df = _docs(
        spark, [(i, "x", "s", 10 + (i % 100) * 10) for i in range(2000)]
    )
    monkeypatch.setattr(sampling.tables, "table", lambda *_a: df)
    out = sampling.weighted_priority_sample_query(spark, SF).collect()
    sel_mean = sum(r["w"] for r in out) / len(out)
    pop_mean = sum(10 + (i % 100) * 10 for i in range(2000)) / 2000
    assert sel_mean > pop_mean


def test_source_dedup_matrix_cross_flag(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import dedup

    twin = "the quick brown fox jumps over the lazy dog " * 5
    rows = [
        (1, twin, "A", len(twin)),
        (2, twin, "B", len(twin)),   # cross-source copy
        (3, twin, "A", len(twin)),   # intra-source copy of 1
        (4, "other words entirely", "B", 20),
    ]
    df = _docs(spark, rows)
    monkeypatch.setattr(dedup.tables, "table", lambda *_a: df)
    out = {
        (r["source_a"], r["source_b"]): r
        for r in dedup.source_dedup_matrix_query(spark, SF).collect()
    }
    assert out[("A", "A")]["n_pairs"] == 1 and out[("A", "A")]["n_cross"] == 0
    assert out[("A", "B")]["n_pairs"] == 2 and out[("A", "B")]["n_cross"] == 2


def test_idle_customer_balance_semantics(spark, monkeypatch):
    import datetime as dt

    import pyspark.sql.types as TT

    from _kafka_streams_scaffold_spark.operators import analytics

    cust_schema = TT.StructType(
        [
            TT.StructField("c_custkey", TT.LongType()),
            TT.StructField("c_name", TT.StringType()),
            TT.StructField("c_nationkey", TT.IntegerType()),
            TT.StructField("c_acctbal", TT.DoubleType()),
            TT.StructField("c_mktsegment", TT.StringType()),
        ]
    )
    ord_schema = TT.StructType(
        [
            TT.StructField("o_orderkey", TT.LongType()),
            TT.StructField("o_custkey", TT.LongType()),
            TT.StructField("o_orderdate", TT.TimestampType()),
        ]
    )
    # avg positive balance = (100+300+500)/3 = 300
    custs = spark.createDataFrame(
        [
            (1, "a", 7, 500.0, "m"),   # rich, old order only -> idle
            (2, "b", 7, 400.0, "m"),   # rich, recent order -> excluded
            (3, "c", 8, 100.0, "m"),   # below avg -> excluded
            (4, "d", 8, 300.0, "m"),   # == avg (not >) -> excluded
        ],
        cust_schema,
    )
    # use a 4th customer with negative bal to pin the positive-only avg
    custs = custs.union(
        spark.createDataFrame([(5, "e", 9, -50.0, "m")], cust_schema)
    )
    orders = spark.createDataFrame(
        [
            (10, 1, dt.datetime(1997, 5, 1)),   # old
            (11, 2, dt.datetime(1999, 5, 1)),   # recent
        ],
        ord_schema,
    )
    real = analytics.tables.table
    monkeypatch.setattr(
        analytics.tables,
        "table",
        lambda s_, sf, name: custs if name == "customer" else orders,
    )
    out = analytics.idle_customer_balance_query(spark, SF).collect()
    monkeypatch.setattr(analytics.tables, "table", real)
    assert len(out) == 1
    assert out[0]["c_nationkey"] == 7
    assert out[0]["n_custs"] == 1 and out[0]["total_bal"] == 500.0


def test_source_similarity_matrix_bounds_and_identity(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import textops

    rows = [
        (1, "alpha beta gamma alpha", "A", 20),
        (2, "alpha beta gamma", "B", 16),       # same distribution as A
        (3, "delta epsilon zeta eta", "C", 22),  # disjoint vocab
    ]
    df = _docs(spark, rows)
    monkeypatch.setattr(textops.tables, "table", lambda *_a: df)
    out = {
        (r["source_a"], r["source_b"]): r["cos_fp"]
        for r in textops.source_similarity_matrix_query(spark, SF).collect()
    }
    assert 0 <= out[("A", "B")] <= 1_000_000
    assert out[("A", "B")] > 900_000     # near-identical distributions
    assert out[("A", "C")] == 0 and out[("B", "C")] == 0  # disjoint vocab


def test_ivf_probe_recall_curve_is_monotone(spark):
    """More probes can only add candidates: recall must be monotone
    nondecreasing in nprobe, and hit 1.0 when every cell is probed
    (here max level may still miss; assert monotone + bounds)."""
    from _kafka_streams_scaffold_spark.operators import similarity

    rows = sorted(
        similarity.ivf_probe_recall_curve_query(
            spark, "/root/testdata/sf0.01"
        ).collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == list(similarity.PROBE_CURVE_LEVELS)
    recalls = [r["recall"] for r in rows]
    assert all(0.0 <= r <= 1.0 for r in recalls)
    assert recalls == sorted(recalls)  # monotone in probe budget
    assert recalls[-1] > 0.5  # 4 probes should find most neighbors
    for r in rows:
        assert r["n_expected"] == similarity.N_QUERIES * similarity.TOP_K
