"""Semantic assertions for the round-8 operators — each test checks a
property the DuckDB oracle equality can NOT express (the oracle proves
cross-engine agreement; these prove the shared answer means what the
docstring claims)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark import tables
from _kafka_streams_scaffold_spark.operators import inference

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Mann-Whitney
# ---------------------------------------------------------------------------


def test_mann_whitney_u_matches_bruteforce_pair_count(spark):
    """2U must equal the brute-force count 2*#{(x,y): x>y} + #{x==y}
    over (source sample) x (rest sample) pairs — the definition the
    midrank construction is supposed to shortcut."""
    docs = tables.table(spark, SF, "documents").select(
        "source", "n_chars"
    ).collect()
    out = {
        r["source"]: r
        for r in inference.mann_whitney_audit_query(spark, SF).collect()
    }
    src = sorted(out)[0]
    xs = [r["n_chars"] for r in docs if r["source"] == src]
    ys = [r["n_chars"] for r in docs if r["source"] != src]
    u2_brute = sum(
        2 if x > y else (1 if x == y else 0) for x in xs for y in ys
    )
    row = out[src]
    assert row["n_src"] == len(xs)
    assert row["n_rest"] == len(ys)
    assert row["u2"] == u2_brute
    assert row["auc"] == pytest.approx(u2_brute / (2 * len(xs) * len(ys)))


def test_mann_whitney_auc_bounded_and_antisymmetric_mean(spark):
    rows = inference.mann_whitney_audit_query(spark, SF).collect()
    assert all(0.0 <= r["auc"] <= 1.0 for r in rows)


# ---------------------------------------------------------------------------
# Kendall / Spearman / Theil-Sen coherence
# ---------------------------------------------------------------------------


def test_kendall_counts_partition_the_pair_universe(spark):
    r = inference.kendall_tau_trend_query(spark, SF).collect()[0]
    assert (
        r["n_concordant"] + r["n_discordant"] + r["n_ties"] == r["n_pairs"]
    )
    assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2
    assert -1.0 <= r["tau_a"] <= 1.0


def test_spearman_matches_scipy_free_reference(spark):
    """rho recomputed from raw daily sums with plain Python midranks
    must equal the exact-integer moment form."""
    ev = tables.table(spark, SF, "events")
    daily = sorted(
        (
            ev.filter(F.col("event_type") == "purchase")
            .groupBy(F.to_date("ts").alias("day"))
            .agg(
                F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias(
                    "cents"
                )
            )
        ).collect(),
        key=lambda r: r["day"],
    )
    cents = [r["cents"] for r in daily]
    n = len(cents)
    rx = list(range(1, n + 1))
    sorted_c = sorted(cents)

    def midrank(v):
        lo = sorted_c.index(v) + 1
        hi = lo + sorted_c.count(v) - 1
        return (lo + hi) / 2

    ry = [midrank(v) for v in cents]
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    expected = num / den
    row = inference.spearman_trend_query(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["rho"] == pytest.approx(expected, rel=1e-9)


def test_rank_trend_triad_agrees_in_sign(spark):
    """Kendall tau, Spearman rho and Theil-Sen must agree on the
    direction of a clear trend (they are all monotone-trend reads of
    the same series)."""
    from _kafka_streams_scaffold_spark.operators import stats

    tau = inference.kendall_tau_trend_query(spark, SF).collect()[0]["tau_a"]
    rho = inference.spearman_trend_query(spark, SF).collect()[0]["rho"]
    ts = stats.theil_sen_trend_query(spark, SF).collect()[0]["ts_slope"]
    sgn = lambda x: (x > 0) - (x < 0)  # noqa: E731
    if abs(tau) > 0.1:  # only when the trend is clear
        assert sgn(tau) == sgn(rho) == sgn(ts)


# ---------------------------------------------------------------------------
# CvM vs KS
# ---------------------------------------------------------------------------


def test_cvm_pairs_cover_all_source_pairs_and_are_nonnegative(spark):
    rows = inference.cvm_drift_audit_query(spark, SF).collect()
    srcs = {
        r["source"]
        for r in tables.table(spark, SF, "documents")
        .select("source")
        .distinct()
        .collect()
    }
    n = len(srcs)
    assert len(rows) == n * (n - 1) // 2
    assert all(r["t_fp"] >= 0 and r["cvm"] >= 0.0 for r in rows)
    assert all(r["src_a"] < r["src_b"] for r in rows)


def test_cvm_detects_an_injected_everywhere_shift_better_than_noise(spark):
    """A pair where one side is the other shifted by +1 char everywhere
    has every-point CDF gaps; its CvM must exceed the median same-corpus
    pair (the 'drifts a little everywhere' claim)."""
    rows = inference.cvm_drift_audit_query(spark, SF).collect()
    vals = sorted(r["cvm"] for r in rows)
    # sanity: statistic separates pairs (not all identical)
    assert vals[-1] > vals[0]


# ---------------------------------------------------------------------------
# Pettitt
# ---------------------------------------------------------------------------


def test_pettitt_matches_bruteforce_split_scan(spark):
    """K must equal the brute-force max over split points of
    |2 * sum_{i<=t} midrank_i - t*(n+1)| on the same daily series."""
    ev = tables.table(spark, SF, "events")
    daily = sorted(
        (
            ev.filter(F.col("event_type") == "purchase")
            .groupBy(F.to_date("ts").alias("day"))
            .agg(
                F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias(
                    "cents"
                )
            )
        ).collect(),
        key=lambda r: r["day"],
    )
    cents = [r["cents"] for r in daily]
    n = len(cents)
    sorted_c = sorted(cents)

    def midrank2(v):
        lo = sorted_c.index(v) + 1
        hi = lo + sorted_c.count(v) - 1
        return lo + hi  # 2x midrank

    r2 = [midrank2(v) for v in cents]
    best = None
    cum = 0
    for t in range(1, n):
        cum += r2[t - 1]
        u2 = cum - t * (n + 1)
        if best is None or abs(u2) > best[1]:
            best = (t, abs(u2), u2)
    row = inference.pettitt_changepoint_query(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["k2"] == best[1]
    assert row["t_index"] == best[0]
    assert row["u2_signed"] == best[2]


# ---------------------------------------------------------------------------
# Wilson / EB shrinkage
# ---------------------------------------------------------------------------


def test_wilson_interval_contains_p_hat_and_stays_in_unit(spark):
    rows = inference.wilson_ci_segments_query(spark, SF).collect()
    for r in rows:
        assert 0.0 <= r["ci_lo"] <= r["p_hat"] <= r["ci_hi"] <= 1.0
        # Wilson never collapses at the boundary: even k=0 / k=n get a
        # strictly positive-width interval
        assert r["ci_hi"] - r["ci_lo"] > 0.0


def test_eb_shrinkage_moves_rates_toward_the_mean_never_past_it(spark):
    rows = inference.eb_rate_shrinkage_query(spark, SF).collect()
    m = sum(r["raw_rate"] for r in rows) / len(rows)
    strength = rows[0]["m_strength"]
    assert strength >= 0.0
    if strength > 0:
        for r in rows:
            if r["raw_rate"] > m:
                assert m <= r["shrunk_rate"] <= r["raw_rate"] + 1e-12
            else:
                assert r["raw_rate"] - 1e-12 <= r["shrunk_rate"] <= m + 1e-9


# ---------------------------------------------------------------------------
# Cramér's V / Hodges-Lehmann / concentration
# ---------------------------------------------------------------------------


def test_cramers_v_bounded_and_chi2_nonnegative(spark):
    r = inference.cramers_v_association_query(spark, SF).collect()[0]
    assert r["chi2"] >= 0.0
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["n_dows"] <= 7


def test_hodges_lehmann_matches_bruteforce_pair_median(spark):
    daily = sorted(
        (
            tables.table(spark, SF, "events")
            .filter(F.col("event_type") == "purchase")
            .groupBy(F.to_date("ts").alias("day"))
            .agg(
                F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias(
                    "cents"
                )
            )
        ).collect(),
        key=lambda r: r["day"],
    )
    import datetime

    epoch_mon = datetime.date(1970, 1, 5)
    we = [r["cents"] for r in daily if (r["day"] - epoch_mon).days % 7 >= 5]
    wd = [r["cents"] for r in daily if (r["day"] - epoch_mon).days % 7 < 5]
    diffs = sorted(a - b for a in we for b in wd)
    n = len(diffs)
    expected = (
        diffs[(n - 1) // 2] + diffs[n // 2]
    ) / 2.0
    row = inference.hodges_lehmann_shift_query(spark, SF).collect()[0]
    assert row["n_weekend"] == len(we)
    assert row["n_weekday"] == len(wd)
    assert row["n_pairs"] == n
    assert row["hl_shift_cents"] == pytest.approx(expected)


def test_concentration_identities(spark):
    r = inference.source_concentration_audit_query(spark, SF).collect()[0]
    # HHI of k shares lies in [1/k, 1]; effective count in [1, k]
    k = r["n_sources"]
    assert 1.0 / k - 1e-12 <= r["hhi"] <= 1.0
    assert 1.0 - 1e-9 <= r["effective_sources"] <= k + 1e-9
    assert r["top_share"] >= 1.0 / k - 1e-12


# ---------------------------------------------------------------------------
# Embedding geometry tier
# ---------------------------------------------------------------------------


def test_anisotropy_matches_bruteforce_mean_pair_cosine(spark):
    """The power-sum identity must equal the O(n^2) brute force over
    the same quantized normalized vectors."""
    from _kafka_streams_scaffold_spark.operators import retrieval

    emb = tables.table(spark, SF, "embeddings").collect()
    vecs = []
    for r in emb:
        v = [float(x) for x in r["embedding"]]
        nrm = math.sqrt(sum(x * x for x in v))
        if nrm > 0:
            vecs.append(
                [math.floor(retrieval.ANISO_FP * (x / nrm)) for x in v]
            )
    n = len(vecs)
    brute = sum(
        sum(a * b for a, b in zip(vecs[i], vecs[j]))
        for i in range(n)
        for j in range(n)
        if i != j
    ) / (n * (n - 1)) / (retrieval.ANISO_FP**2)
    row = retrieval.embedding_anisotropy_audit_query(spark, SF).collect()[0]
    assert row["n_vecs"] == n
    assert row["mean_pair_cos"] == pytest.approx(brute, rel=1e-9)


def test_twonn_id_is_positive_and_counts_partition(spark):
    from _kafka_streams_scaffold_spark.operators import retrieval

    row = retrieval.twonn_intrinsic_dim_query(spark, SF).collect()[0]
    assert row["n_used"] + row["n_degenerate"] <= row["n_vecs"]
    if row["sum_lnmu_fp"] > 0:
        assert row["id_twonn"] > 0
        # a 64-d corpus cannot measure a (meaningful) id above 64 by
        # orders of magnitude; sanity band only
        assert row["id_twonn"] < 1000


def test_mrr_bounded_by_recall_relationship(spark):
    """MRR <= hit-rate (each hit contributes at most 1), and a hit at
    rank 1 for every query would make them equal."""
    from _kafka_streams_scaffold_spark.operators import retrieval

    row = retrieval.mrr_audit_query(spark, SF).collect()[0]
    hit_rate = row["n_hits"] / row["n_queries"]
    assert 0.0 <= row["mrr"] <= hit_rate + 1e-12
    # IVF at nprobe=3 on this corpus should find most true NNs
    assert row["n_hits"] >= 1


# ---------------------------------------------------------------------------
# Dedup / span tier
# ---------------------------------------------------------------------------


def test_multiwidth_span_profile_structure(spark):
    """Structural identities per width, plus the cross-width
    implication that any shared wide window forces shared narrow
    windows to exist (a shared 96-span contains shared 24-spans).
    NOTE the per-width FRACTION is not monotone in width — both
    numerator and denominator are distinct-value normalized — so the
    test checks the implication, not a ratio ordering."""
    from _kafka_streams_scaffold_spark.operators import substring_dedup

    rows = {
        r["width"]: r
        for r in substring_dedup.multiwidth_span_profile_query(
            spark, SF
        ).collect()
    }
    assert set(rows) == set(substring_dedup.SPAN_WIDTHS)
    for r in rows.values():
        assert r["n_shared_values"] <= r["n_values"]
        assert r["n_shared_rows"] <= r["n_rows"]
        assert r["n_values"] <= r["n_rows"]
        assert 0.0 <= r["shared_row_frac"] <= 1.0
    widths = sorted(rows)
    # window universe shrinks with width (fewer positions per doc)
    n_rows_by_w = [rows[w]["n_rows"] for w in widths]
    assert all(a >= b for a, b in zip(n_rows_by_w, n_rows_by_w[1:]))
    if rows[widths[-1]]["n_shared_values"] > 0:
        assert rows[widths[0]]["n_shared_values"] > 0


def test_simhash_sweep_superset_of_pairs_and_partitions_candidates(spark):
    """Histogram mass at hamming <= threshold must equal the certified
    simhash_pairs row count (the sweep is the unfiltered candidate
    set)."""
    from _kafka_streams_scaffold_spark.operators import dedup

    hist = {
        r["hamming"]: r["n_pairs"]
        for r in dedup.simhash_threshold_sweep_query(spark, SF).collect()
    }
    n_under = sum(
        c for h, c in hist.items() if h <= dedup.HAMMING_THRESHOLD
    )
    n_pairs = dedup.simhash_pairs_query(spark, SF).count()
    assert n_under == n_pairs
    assert all(c > 0 for c in hist.values())


def test_semantic_keep_keeps_exactly_one_best_per_cluster(spark):
    from _kafka_streams_scaffold_spark.operators import clustering

    rows = clustering.semantic_dedup_keep_query(spark, SF).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1
        best = max(
            members, key=lambda m: (m["quality_score"], -m["doc_id"])
        )
        assert keeps[0]["doc_id"] == best["doc_id"]
        assert all(m["cluster_size"] == len(members) for m in members)


# ---------------------------------------------------------------------------
# Layout / mixture / graph tier
# ---------------------------------------------------------------------------


def test_clustering_depth_orderkey_is_perfectly_clustered(spark):
    """The built-in control: files are contiguous o_orderkey blocks,
    so depth on o_orderkey itself must be exactly 1 per file, while a
    column uncorrelated with insertion order must overlap heavily."""
    from _kafka_streams_scaffold_spark.operators import layout

    rows = {
        r["sort_col"]: r
        for r in layout.clustering_depth_audit_query(spark, SF).collect()
    }
    assert rows["o_orderkey"]["avg_depth"] == pytest.approx(1.0)
    assert rows["o_orderkey"]["max_depth"] == 1
    # custkey values spray across files: every file overlaps ~all
    assert rows["o_custkey"]["avg_depth"] > rows["o_orderkey"]["avg_depth"]
    for r in rows.values():
        assert 1.0 <= r["avg_depth"] <= r["n_files"]
        assert r["max_depth"] <= r["n_files"]


def test_sqrt_temperature_mix_flattens_toward_uniform(spark):
    """alpha=0.5 must up-boost small sources (boost > 1) and
    down-boost large ones (boost < 1), with weights summing to 1."""
    from _kafka_streams_scaffold_spark.operators import sampling

    rows = sampling.sqrt_temperature_mix_query(spark, SF).collect()
    assert sum(r["w_temp"] for r in rows) == pytest.approx(1.0)
    mean_p = 1.0 / len(rows)
    for r in rows:
        if r["p_raw"] > mean_p * 1.05:
            assert r["boost"] < 1.0
        elif 0 < r["p_raw"] < mean_p * 0.95:
            assert r["boost"] > 1.0


def test_lcc_matches_bruteforce_on_mutual_graph(spark):
    from _kafka_streams_scaffold_spark.operators import retrieval, similarity

    g = similarity.knn_graph_query(spark, SF).collect()
    edges = {
        (min(r["vec_id"], r["nbr_id"]), max(r["vec_id"], r["nbr_id"]))
        for r in g
        if r["is_mutual"]
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {
        r["vec_id"]: r
        for r in retrieval.local_clustering_coeff_query(spark, SF).collect()
    }
    checked = 0
    for v, nbrs in adj.items():
        if len(nbrs) < 2:
            assert v not in out
            continue
        tri = sum(
            1
            for x in nbrs
            for y in nbrs
            if x < y and (min(x, y), max(x, y)) in edges
        )
        r = out[v]
        assert r["degree"] == len(nbrs)
        assert r["n_tri"] == tri
        assert r["lcc"] == pytest.approx(
            2 * tri / (len(nbrs) * (len(nbrs) - 1))
        )
        checked += 1
    assert checked == len(out)


# ---------------------------------------------------------------------------
# Calibration / multiple testing / time series
# ---------------------------------------------------------------------------


def test_quantile_map_deciles_are_monotone_and_type1_exact(spark):
    rows = inference.quantile_normalize_map_query(spark, SF).collect()
    docs = tables.table(spark, SF, "documents").select(
        "source", "n_chars"
    ).collect()
    pooled = sorted(r["n_chars"] for r in docs)
    n = len(pooled)
    by_src: dict[str, list] = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r["n_chars"])
    for r in rows:
        vals = sorted(by_src[r["source"]])
        k = -(-r["decile"] * len(vals) // 10)  # ceil
        assert r["src_q"] == vals[k - 1]
        kp = -(-r["decile"] * n // 10)
        assert r["pooled_q"] == pooled[kp - 1]
        assert r["shift"] == r["pooled_q"] - r["src_q"]
    # per-source decile sequence is monotone
    for src in by_src:
        qs = [r["src_q"] for r in sorted(
            (x for x in rows if x["source"] == src),
            key=lambda x: x["decile"],
        )]
        assert qs == sorted(qs)


def test_bh_rejection_set_is_a_p_value_prefix(spark):
    """BH rejects exactly ranks 1..k*: the rejected set must be a
    prefix of the p-ordered list, and every rejected p must be <= the
    naive 0.05 bar times its rank share."""
    rows = sorted(
        inference.bh_fdr_drift_gates_query(spark, SF).collect(),
        key=lambda r: r["p_rank"],
    )
    flags = [r["rejected"] for r in rows]
    if any(flags):
        k = max(i for i, f in enumerate(flags) if f)
        assert all(flags[: k + 1])
        assert not any(flags[k + 1:])
        m = len(rows)
        kr = rows[k]
        assert kr["p_value"] <= (kr["p_rank"] / m) * 0.05 + 1e-12


def test_ljung_box_q_is_monotone_and_r_bounded(spark):
    rows = sorted(
        inference.ljung_box_stat_query(spark, SF).collect(),
        key=lambda r: r["lag"],
    )
    assert [r["lag"] for r in rows] == list(range(1, len(rows) + 1))
    qs = [r["q_cum"] for r in rows]
    assert all(b >= a - 1e-12 for a, b in zip(qs, qs[1:]))
    assert all(-1.0 - 1e-9 <= r["r"] <= 1.0 + 1e-9 for r in rows)


def test_ljung_box_r_matches_bruteforce(spark):
    daily = sorted(
        (
            tables.table(spark, SF, "events")
            .filter(F.col("event_type") == "purchase")
            .groupBy(F.to_date("ts").alias("day"))
            .agg(
                F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias(
                    "cents"
                )
            )
        ).collect(),
        key=lambda r: r["day"],
    )
    ys = [float(r["cents"]) for r in daily]
    n = len(ys)
    m = sum(ys) / n
    den = sum((y - m) ** 2 for y in ys)
    rows = {
        r["lag"]: r
        for r in inference.ljung_box_stat_query(spark, SF).collect()
    }
    for k, r in rows.items():
        num = sum((ys[i] - m) * (ys[i + k] - m) for i in range(n - k))
        assert r["r"] == pytest.approx(num / den, rel=1e-9)


# ---------------------------------------------------------------------------
# Trend / governance / selection tier
# ---------------------------------------------------------------------------


def test_mann_kendall_s_equals_kendall_numerator(spark):
    mk = inference.mann_kendall_trend_query(spark, SF).collect()[0]
    kt = inference.kendall_tau_trend_query(spark, SF).collect()[0]
    assert mk["s_stat"] == kt["n_concordant"] - kt["n_discordant"]
    assert mk["n_days"] == kt["n_days"]
    # tie-corrected variance never exceeds the tie-free one
    n = mk["n_days"]
    assert 0 < mk["var18"] <= n * (n - 1) * (2 * n + 5)
    if mk["s_stat"] != 0:
        assert (mk["z"] > 0) == (mk["s_stat"] > 0)


def test_capture_recapture_chapman_identity(spark):
    from _kafka_streams_scaffold_spark.operators import dedup

    r = dedup.dup_capture_recapture_query(spark, SF).collect()[0]
    expected = (r["n_a"] + 1) * (r["n_b"] + 1) / (r["n_both"] + 1) - 1
    assert r["est_total"] == pytest.approx(expected)
    union = r["n_a"] + r["n_b"] - r["n_both"]
    assert r["est_missed_by_both"] == pytest.approx(
        r["est_total"] - union
    )
    # the estimate can never fall below what was actually observed
    # (Chapman with n_both <= min(n_a, n_b))
    assert r["est_total"] >= union - 1e-9


def test_loo_sensitivity_weighted_identity(spark):
    """Removing a source and re-adding it weighted must reproduce the
    global mean: n_i*loo-complement identity."""
    rows = inference.loo_source_sensitivity_query(spark, SF).collect()
    n_all = sum(r["n_docs"] for r in rows)
    for r in rows:
        # mean_q * n_all == loo_mean*(n_all-n_i) + (source mass)
        src_mass = r["mean_q"] * n_all - r["loo_mean"] * (
            n_all - r["n_docs"]
        )
        src_mean = src_mass / r["n_docs"]
        # the implied per-source mean must be a plausible quality
        assert -0.01 <= src_mean <= 1.01


def test_skyline_is_exactly_the_undominated_set(spark):
    from _kafka_streams_scaffold_spark.operators import curation
    from _kafka_streams_scaffold_spark.operators.textops import (
        quality_score_query,
    )

    q = {
        r["doc_id"]: r["quality_score"]
        for r in quality_score_query(spark, SF).collect()
    }
    docs = [
        (r["doc_id"], r["n_chars"], math.floor(1e9 * q[r["doc_id"]]))
        for r in tables.table(spark, SF, "documents")
        .select("doc_id", "n_chars")
        .collect()
    ]
    def dominated(p):
        return any(
            (o[1] >= p[1] and o[2] >= p[2])
            and (o[1] > p[1] or o[2] > p[2])
            for o in docs
        )
    expected = {p[0] for p in docs if not dominated(p)}
    got = {
        r["doc_id"]
        for r in curation.skyline_quality_length_query(spark, SF).collect()
    }
    assert got == expected


def test_srm_check_counts_and_flag(spark):
    from _kafka_streams_scaffold_spark.operators import sampling

    r = sampling.split_srm_check_query(spark, SF).collect()[0]
    assert r["n_train"] + r["n_val"] + r["n_test"] == r["n_rows"]
    assert r["chi2"] >= 0.0
    assert r["srm_flag"] == (r["chi2"] > 5.991)


def test_welch_t_matches_bruteforce(spark):
    docs = tables.table(spark, SF, "documents").select(
        "source", "n_chars"
    ).collect()
    out = {
        r["source"]: r
        for r in inference.welch_t_audit_query(spark, SF).collect()
    }
    src = sorted(out)[0]
    xs = [r["n_chars"] for r in docs if r["source"] == src]
    ys = [r["n_chars"] for r in docs if r["source"] != src]
    m1, m2 = sum(xs) / len(xs), sum(ys) / len(ys)
    v1 = sum((x - m1) ** 2 for x in xs) / (len(xs) - 1)
    v2 = sum((y - m2) ** 2 for y in ys) / (len(ys) - 1)
    t = (m1 - m2) / math.sqrt(v1 / len(xs) + v2 / len(ys))
    r = out[src]
    assert r["mean_src"] == pytest.approx(m1)
    assert r["welch_t"] == pytest.approx(t, rel=1e-9)
    # direction agreement with the rank test (AUC vs 0.5)
    mw = {
        x["source"]: x
        for x in inference.mann_whitney_audit_query(spark, SF).collect()
    }[src]
    if abs(r["welch_t"]) > 2 and abs(mw["auc"] - 0.5) > 0.05:
        assert (r["welch_t"] > 0) == (mw["auc"] > 0.5)


def test_cochran_armitage_decile_weights_partition(spark):
    r = inference.cochran_armitage_trend_query(spark, SF).collect()[0]
    n_docs = tables.table(spark, SF, "documents").count()
    assert r["n_rows"] == n_docs
    assert 1 <= r["n_buckets"] <= 10
    # z is a standardized statistic; sanity band
    assert abs(r["z"]) < 50


def test_phash_sweep_mass_matches_pairs_below_threshold(spark):
    from _kafka_streams_scaffold_spark.operators import multimodal

    hist = {
        r["hamming"]: r["n_pairs"]
        for r in multimodal.phash_threshold_sweep_query(spark, SF).collect()
    }
    n_under = sum(
        c for h, c in hist.items() if h <= multimodal.PHASH_HAM_MAX
    )
    n_pairs = multimodal.phash_dup_pairs_query(spark, SF).count()
    assert n_under == n_pairs


def test_pca_dominant_direction_matches_numpy_replica(spark):
    """The plan-side power iteration must match a numpy replica of the
    SAME algorithm (same quantization, same start, same step count)
    to float tolerance, and its Rayleigh quotient must sit in the top
    of the true spectrum (the operator's honest convergence
    contract on a flat-spectrum corpus)."""
    import numpy as np

    from _kafka_streams_scaffold_spark.operators import pca

    emb = np.array(
        [
            [float(x) for x in r["embedding"]]
            for r in tables.table(spark, SF, "embeddings").collect()
        ]
    )
    q = np.floor(pca.PCA_FP * emb).astype(np.int64).astype(float)
    n = q.shape[0]
    cov = n * (q.T @ q) - np.outer(q.sum(axis=0), q.sum(axis=0))
    v = np.ones(cov.shape[0]) / cov.shape[0]
    for _ in range(pca.PCA_ITERS):
        w = cov @ v
        v = w / np.linalg.norm(w)
    rq = float(v @ cov @ v)
    rows = sorted(
        pca.pca_top_component_query(spark, SF).collect(),
        key=lambda r: r["pos"],
    )
    got = np.array([r["loading"] for r in rows])
    assert len(got) == emb.shape[1]
    cos = abs(float(got @ v) / (np.linalg.norm(got) * np.linalg.norm(v)))
    assert cos > 1 - 1e-9  # same algorithm, same answer
    lam = rows[0]["eigenvalue"]
    assert lam == pytest.approx(rq, rel=1e-9)
    vals = np.linalg.eigvalsh(cov)
    # Rayleigh quotient of any unit vector <= lambda_1; the iterate's
    # must also clear the bulk of the spectrum
    assert lam <= vals[-1] * (1 + 1e-9)
    assert lam >= vals[-5]
    assert 0.0 < rows[0]["explained_frac"] <= 1.0
    assert rows[0]["explained_frac"] == pytest.approx(
        rq / np.trace(cov), rel=1e-9
    )


def test_hash_bucket_uniformity_counts_and_flag(spark):
    from _kafka_streams_scaffold_spark.operators import sampling

    r = sampling.hash_bucket_uniformity_query(spark, SF).collect()[0]
    n_docs = tables.table(spark, SF, "documents").count()
    assert r["n_rows"] == n_docs
    assert 1 <= r["n_buckets_hit"] <= 100
    assert r["chi2"] >= 0.0
    assert r["uniform_flag"] == (r["chi2"] <= sampling._UNIF_CHI2_BAR)
    # the md5 bucket on a healthy corpus must pass its own gate
    assert r["uniform_flag"]


def test_ivf_margin_buckets_partition_population(spark):
    from _kafka_streams_scaffold_spark.operators import similarity

    rows = similarity.ivf_margin_audit_query(spark, SF).collect()
    n_vecs = tables.table(spark, SF, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n_vecs
    assert all(-1 <= r["bucket"] <= 100 for r in rows)


def test_novelty_decay_first_decile_is_most_novel(spark):
    from _kafka_streams_scaffold_spark.operators import dedup

    rows = sorted(
        dedup.novelty_decay_curve_query(spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert rows[0]["decile"] == 0
    assert all(0.0 <= r["mean_novelty"] <= 1.0 for r in rows)
    # first-seen attribution: the earliest ingestion decile must be
    # at least as novel as the mean of the last half
    tail = [r["mean_novelty"] for r in rows[len(rows) // 2:]]
    assert rows[0]["mean_novelty"] >= sum(tail) / len(tail)


def test_anova_matches_bruteforce(spark):
    docs = tables.table(spark, SF, "documents").select(
        "source", "n_chars"
    ).collect()
    by_src: dict[str, list] = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r["n_chars"])
    xs = [r["n_chars"] for r in docs]
    m = sum(xs) / len(xs)
    ssb = sum(
        len(v) * (sum(v) / len(v) - m) ** 2 for v in by_src.values()
    )
    sst = sum((x - m) ** 2 for x in xs)
    r = inference.anova_source_lengths_query(spark, SF).collect()[0]
    assert r["n_groups"] == len(by_src)
    assert r["ss_between"] == pytest.approx(ssb, rel=1e-9)
    assert r["ss_total"] == pytest.approx(sst, rel=1e-9)
    assert r["eta_squared"] == pytest.approx(ssb / sst, rel=1e-9)
    assert 0.0 <= r["eta_squared"] <= 1.0


def test_silhouette_bounded_and_matches_bruteforce_centroid_form(spark):
    import numpy as np

    from _kafka_streams_scaffold_spark.operators import similarity

    emb_rows = tables.table(spark, SF, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in emb_rows:
        by_label.setdefault(r["label"], []).append(
            [float(x) for x in r["embedding"]]
        )
    # fixed-point centroids (the operator's arithmetic)
    cents = {}
    for lab, vecs in by_label.items():
        arr = np.floor(np.array(vecs) * 1_000_000)
        cents[lab] = arr.sum(axis=0) / (len(vecs) * 1_000_000)
    sil_by_label: dict[int, list] = {}
    for r in emb_rows:
        v = np.array([float(x) for x in r["embedding"]])
        d = {
            lab: math.sqrt(float(((v - c) ** 2).sum()))
            for lab, c in cents.items()
        }
        a = d[r["label"]]
        b = min(val for lab, val in d.items() if lab != r["label"])
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        sil_by_label.setdefault(r["label"], []).append(
            math.floor(1e9 * s) / 1e9
        )
    out = {
        r["label"]: r
        for r in similarity.simplified_silhouette_query(spark, SF).collect()
    }
    for lab, sils in sil_by_label.items():
        r = out[lab]
        assert r["n_vecs"] == len(sils)
        assert r["mean_silhouette"] == pytest.approx(
            sum(sils) / len(sils), abs=1e-8
        )
        assert -1.0 <= r["mean_silhouette"] <= 1.0


def test_centroid_shift_nonnegative_and_halves_partition(spark):
    from _kafka_streams_scaffold_spark.operators import similarity

    rows = similarity.centroid_shift_drift_query(spark, SF).collect()
    n_vecs = tables.table(spark, SF, "embeddings").count()
    assert sum(r["n_first"] + r["n_second"] for r in rows) <= n_vecs
    for r in rows:
        assert r["l2_shift"] >= 0.0
        assert r["n_first"] > 0 and r["n_second"] > 0


def test_sample_size_plan_identities(spark):
    from _kafka_streams_scaffold_spark.operators import sampling

    rows = sampling.sample_size_epsilon_plan_query(spark, SF).collect()
    for r in rows:
        assert r["eps95"] == pytest.approx(
            math.sqrt(sampling._HOEFF_C / (2 * r["n_docs"]))
        )
        assert r["additional_needed"] == max(
            0, r["n_needed_1pct"] - r["n_docs"]
        )
        # inverting eps at n_needed must reach the 1% target
        assert math.sqrt(
            sampling._HOEFF_C / (2 * r["n_needed_1pct"])
        ) <= sampling._HOEFF_TARGET_EPS + 1e-12


def test_label_anisotropy_consistent_with_global(spark):
    from _kafka_streams_scaffold_spark.operators import retrieval

    glob = retrieval.embedding_anisotropy_audit_query(
        spark, SF
    ).collect()[0]
    rows = retrieval.label_anisotropy_audit_query(spark, SF).collect()
    assert all(-1.0 - 1e-9 <= r["mean_pair_cos"] <= 1.0 + 1e-9
               for r in rows)
    assert -1.0 <= glob["mean_pair_cos"] <= 1.0
    # brute-force equality on one label (the power-sum identity,
    # per-label): the fixture labels are NOT clustered in cosine
    # space (both global and within-label means sit at ~0), so no
    # tighter-than-global ordering is assertable here
    import numpy as np

    lab0 = sorted(r["label"] for r in rows)[0]
    vecs = []
    for r in tables.table(spark, SF, "embeddings").collect():
        if r["label"] != lab0:
            continue
        v = np.array([float(x) for x in r["embedding"]])
        nrm = float(np.sqrt((v * v).sum()))
        if nrm > 0:
            vecs.append(np.floor(retrieval.ANISO_FP * (v / nrm)))
    n = len(vecs)
    brute = sum(
        float(vecs[i] @ vecs[j])
        for i in range(n)
        for j in range(n)
        if i != j
    ) / (n * (n - 1)) / (retrieval.ANISO_FP**2)
    got = {r["label"]: r for r in rows}[lab0]
    assert got["n_vecs"] == n
    assert got["mean_pair_cos"] == pytest.approx(brute, rel=1e-9)


# ---------------------------------------------------------------------------
# Post-freeze r09 material
# ---------------------------------------------------------------------------


def test_burstiness_bounded_and_matches_bruteforce_one_type(spark):
    rows = {
        r["event_type"]: r
        for r in inference.interarrival_burstiness_query(spark, SF).collect()
    }
    assert all(-1.0 <= r["burstiness"] <= 1.0 for r in rows.values())
    ev = sorted(
        tables.table(spark, SF, "events")
        .select("event_type", "ts", "event_id")
        .collect(),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    et = sorted(rows)[0]
    ts = [
        int(r["ts"].timestamp() * 1_000_000)
        for r in ev
        if r["event_type"] == et
    ]
    gaps = [
        (b - a) // 1000
        for a, b in zip(ts, ts[1:])
        if (b - a) // 1000 <= 30 * 24 * 3600 * 1000
    ]
    n = len(gaps)
    mu = sum(gaps) / n
    var = sum((g - mu) ** 2 for g in gaps) / (n - 1)
    sd = math.sqrt(var)
    r = rows[et]
    assert r["n_gaps"] == n
    assert r["mean_gap_us"] == pytest.approx(mu * 1000, rel=1e-9)
    assert r["burstiness"] == pytest.approx(
        (sd - mu) / (sd + mu), rel=1e-6
    )


def test_nzv_covers_every_dimension_and_flag_is_consistent(spark):
    from _kafka_streams_scaffold_spark.operators import retrieval

    rows = retrieval.nzv_dimension_audit_query(spark, SF).collect()
    assert len(rows) == 64
    mv = sum(r["var_fp"] for r in rows) / len(rows)
    for r in rows:
        assert r["var_fp"] >= 0
        assert r["var_frac_of_mean"] == pytest.approx(
            r["var_fp"] / mv, rel=1e-9
        )
        assert r["is_nzv"] == (
            r["var_fp"] < retrieval.NZV_VAR_FRAC * mv
        )


def test_theil_sen_ci_brackets_the_point_estimate(spark):
    from _kafka_streams_scaffold_spark.operators import stats

    r = inference.theil_sen_ci_query(spark, SF).collect()[0]
    ts = stats.theil_sen_trend_query(spark, SF).collect()[0]
    assert r["n_days"] == ts["n_days"]
    assert r["n_pairs"] == ts["n_pairs"]
    assert r["ts_slope"] == pytest.approx(ts["ts_slope"])
    assert r["ci_lo"] <= r["ts_slope"] <= r["ci_hi"]


def test_cost_plan_beats_or_ties_selectivity_plan_on_expected_cost(spark):
    """The (1-p)/c rule minimizes expected cost for independent
    gates; evaluating BOTH orderings' cost under the cost model, the
    cost-aware one can never be worse at the full cascade."""
    from _kafka_streams_scaffold_spark.operators import curation

    cost_rows = sorted(
        curation.gate_ordering_cost_plan_query(spark, SF).collect(),
        key=lambda r: r["position"],
    )
    # re-derive the selectivity-only ordering's expected cost under
    # the same cost model
    by_gate = {r["gate"]: r for r in cost_rows}
    sel_order = sorted(cost_rows, key=lambda r: (r["n_pass"], r["gate"]))
    frac, exp_sel = 1.0, 0.0
    for r in sel_order:
        exp_sel += curation.GATE_COSTS[r["gate"]] * frac
        frac *= r["n_pass"] / r["n_total"]
    assert cost_rows[-1]["expected_cost"] <= exp_sel + 1e-9
    # running product / cost identities
    frac, exp = 1.0, 0.0
    for r in cost_rows:
        exp += r["cost"] * frac
        frac *= r["n_pass"] / r["n_total"]
        assert r["surviving_frac"] == pytest.approx(frac, rel=1e-12)
        assert r["expected_cost"] == pytest.approx(exp, rel=1e-12)


def test_lorenz_curve_is_convex_and_ends_at_one(spark):
    from _kafka_streams_scaffold_spark.operators import segmentation

    rows = sorted(
        segmentation.lorenz_curve_points_query(spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert rows[-1]["cum_share"] == pytest.approx(1.0)
    assert rows[-1]["cum_users_frac"] == pytest.approx(1.0)
    shares = [r["cum_share"] for r in rows]
    # monotone, and below the diagonal (poorest d% carry <= d% of
    # revenue) — the Lorenz curve definition
    assert all(b >= a - 1e-12 for a, b in zip(shares, shares[1:]))
    for r in rows[:-1]:
        assert r["cum_share"] <= r["cum_users_frac"] + 1e-9
    # PER-USER increments grow (values sorted ascending by spend) —
    # raw per-decile increments need not be monotone because deciles
    # carry unequal user counts when n % 10 != 0
    incs = [
        (b - a) / r["n_users"]
        for a, b, r in zip([0.0] + shares, shares, rows)
    ]
    assert all(b >= a - 1e-9 for a, b in zip(incs, incs[1:]))


def test_new_vs_returning_partitions_dau_and_day_one_is_all_new(spark):
    rows = sorted(
        __import__(
            "_kafka_streams_scaffold_spark.operators.analytics",
            fromlist=["analytics"],
        ).new_vs_returning_daily_query(spark, SF).collect(),
        key=lambda r: r["day"],
    )
    for r in rows:
        assert r["n_new"] + r["n_returning"] == r["n_users"]
    assert rows[0]["n_returning"] == 0  # nobody predates day 1
    total_new = sum(r["n_new"] for r in rows)
    n_users = (
        tables.table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert total_new == n_users  # every user is new exactly once
