"""Semantic assertions for the round-11 post-freeze additions (the
R12_MATERIAL batch) — each test checks the statistic against a plain
brute-force Python computation of the textbook definition, which the
DuckDB oracle equality can NOT express (the oracle proves cross-engine
agreement; these prove the shared answer is the right statistic)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark import tables
from _kafka_streams_scaffold_spark.operators import (
    dedup,
    drift,
    inference,
    stats,
)

SF = "/root/testdata/sf0.001"


def _daily_order_counts(spark):
    rows = (
        tables.table(spark, SF, "orders")
        .select(
            F.col("o_orderpriority").alias("grp"),
            F.to_date("o_orderdate").alias("day"),
        )
        .collect()
    )
    c = Counter((r["grp"], r["day"]) for r in rows)
    return c


# ---------------------------------------------------------------------------
# Mood's median test
# ---------------------------------------------------------------------------


def test_mood_median_matches_bruteforce(spark):
    """Constructive lower median + k x 2 chi-square, recomputed from
    raw per-(priority, day) counts in Python."""
    c = _daily_order_counts(spark)
    values = sorted(c.values())
    n = len(values)
    med = values[(n + 1) // 2 - 1]  # smallest v with cum >= ceil(n/2)
    groups = defaultdict(lambda: [0, 0])  # grp -> [n_g, a_g]
    for (grp, _), x in c.items():
        groups[grp][0] += 1
        groups[grp][1] += int(x > med)
    n_obs = sum(g[0] for g in groups.values())
    n_above = sum(g[1] for g in groups.values())
    chi2 = 0.0
    for grp in sorted(groups):
        n_g, a_g = groups[grp]
        e_a = n_g * n_above / n_obs
        e_b = n_g * (n_obs - n_above) / n_obs
        chi2 += (a_g - e_a) ** 2 / e_a + ((n_g - a_g) - e_b) ** 2 / e_b
    row = inference.mood_median_test_query(spark, SF).collect()[0]
    assert row["n_cells"] == n_obs
    assert row["grand_median"] == med
    assert row["n_above"] == n_above
    assert row["chi2"] == pytest.approx(chi2, rel=1e-12)


# ---------------------------------------------------------------------------
# Cliff's delta matrix
# ---------------------------------------------------------------------------


def test_cliffs_delta_matches_bruteforce_pair(spark):
    """delta for the lexicographically first source pair equals the
    O(n_a * n_b) textbook double loop."""
    docs = (
        tables.table(spark, SF, "documents")
        .select("source", "n_chars")
        .collect()
    )
    by_src = defaultdict(list)
    for r in docs:
        by_src[r["source"]].append(r["n_chars"])
    srcs = sorted(by_src)
    a, b = srcs[0], srcs[1]
    gt = sum(1 for x in by_src[a] for y in by_src[b] if x > y)
    lt = sum(1 for x in by_src[a] for y in by_src[b] if x < y)
    out = {
        (r["source_a"], r["source_b"]): r
        for r in inference.cliffs_delta_sources_query(spark, SF).collect()
    }
    row = out[(a, b)]
    assert row["gt"] == gt
    assert row["lt"] == lt
    assert row["n_a"] == len(by_src[a])
    assert row["n_b"] == len(by_src[b])
    assert row["delta"] == pytest.approx(
        (gt - lt) / (len(by_src[a]) * len(by_src[b])), rel=1e-12
    )
    # full matrix shape: one row per unordered pair, delta in [-1, 1]
    k = len(srcs)
    assert len(out) == k * (k - 1) // 2
    assert all(-1.0 <= r["delta"] <= 1.0 for r in out.values())


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered trend
# ---------------------------------------------------------------------------


def test_jonckheere_matches_bruteforce(spark):
    """j2 = 2*J with J the half-tie-counted Mann-Whitney sum over
    ordered group pairs; null mean e2 = 2*E[J]."""
    li = (
        tables.table(spark, SF, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    orders = tables.table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("grp"),
    )
    rows = li.join(orders, "l_orderkey").collect()
    by_grp = defaultdict(list)
    for r in rows:
        by_grp[r["grp"]].append(r["v"])
    grps = sorted(by_grp)
    j2 = 0
    for i, gi in enumerate(grps):
        ci = Counter(by_grp[gi])
        for gj in grps[i + 1 :]:
            for y in by_grp[gj]:
                j2 += 2 * sum(c for x, c in ci.items() if x < y)
                j2 += ci.get(y, 0)
    n = sum(len(v) for v in by_grp.values())
    sn2 = sum(len(v) ** 2 for v in by_grp.values())
    row = inference.jonckheere_trend_query(spark, SF).collect()[0]
    assert row["j2"] == j2
    assert row["n_total"] == n
    assert row["e2"] == (n * n - sn2) // 2
    # tie-corrected variance stays positive and z is finite
    assert row["var_j"] > 0
    assert math.isfinite(row["z"])
    # z sign agrees with the raw deviation from the null mean
    assert (row["z"] > 0) == (j2 > (n * n - sn2) // 2) or row["z"] == 0


# ---------------------------------------------------------------------------
# Durbin-Watson daily serial correlation
# ---------------------------------------------------------------------------


def test_durbin_watson_matches_bruteforce(spark):
    """The D-scaled integer DW equals the float textbook DW on
    mean-centered daily counts (scaling cancels exactly)."""
    rows = (
        tables.table(spark, SF, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    series = [r["x"] for r in sorted(rows, key=lambda r: r["day"])]
    d = len(series)
    mean = sum(series) / d
    resid = [x - mean for x in series]
    num = sum(
        (resid[t] - resid[t - 1]) ** 2 for t in range(1, d)
    )
    den = sum(e * e for e in resid)
    row = stats.durbin_watson_daily_query(spark, SF).collect()[0]
    assert row["n_days"] == d
    assert row["total_orders"] == sum(series)
    assert row["dw"] == pytest.approx(num / den, rel=1e-12)
    # scaled integer moments reduce to the same ratio
    assert row["dw_num"] / row["dw_den"] == pytest.approx(
        num / den, rel=1e-12
    )


# ---------------------------------------------------------------------------
# k-sample Anderson-Darling
# ---------------------------------------------------------------------------


def _ad_bruteforce(by_grp):
    """Scholz & Stephens (1987) eq. 7 — the discrete/midrank A2_akN,
    plain Python floats over the pooled distinct-value spine."""
    pooled = Counter()
    for vs in by_grp.values():
        pooled.update(vs)
    values = sorted(pooled)
    n = sum(pooled.values())
    a2 = 0.0
    for g, vs in by_grp.items():
        ci = Counter(vs)
        n_g = len(vs)
        inner = 0.0
        cum_i = 0
        cum_p = 0
        for v in values:
            l_j = pooled[v]
            c_ij = ci.get(v, 0)
            m_a = cum_i + c_ij / 2.0  # M through j, half-corrected
            b_a = cum_p + l_j / 2.0
            den = b_a * (n - b_a) - n * l_j / 4.0
            if den > 0:
                inner += (
                    l_j / n * (n * m_a - n_g * b_a) ** 2 / den
                )
            cum_i += c_ij
            cum_p += l_j
        a2 += inner / n_g
    return (n - 1) / n * a2


def test_ad_ksample_matches_bruteforce(spark):
    docs = (
        tables.table(spark, SF, "documents")
        .select("source", "n_chars")
        .collect()
    )
    by_grp = defaultdict(list)
    for r in docs:
        by_grp[r["source"]].append(r["n_chars"])
    expect = _ad_bruteforce(by_grp)
    row = drift.ad_ksample_sources_query(spark, SF).collect()[0]
    assert row["n_total"] == sum(len(v) for v in by_grp.values())
    assert row["n_groups"] == len(by_grp)
    assert row["mean_h0"] == len(by_grp) - 1
    assert row["a2akn"] == pytest.approx(expect, rel=1e-9)


# ---------------------------------------------------------------------------
# Fleiss' kappa over the detector tier
# ---------------------------------------------------------------------------


def test_fleiss_kappa_matches_moment_identities(spark):
    """kappa recomputed from the emitted exact BIGINT moments via the
    textbook per-item P_i path; the flag-matrix moments must also
    match detector_cochran_q's (same universe, same matrix)."""
    row = dedup.fleiss_kappa_detectors_query(spark, SF).collect()[0]
    q = dedup.detector_cochran_q_query(spark, SF).collect()[0]
    assert row["n_univ"] == q["n_univ"]
    assert row["sum_r"] == q["sum_r"]
    assert row["sum_r2"] == q["sum_r2"]
    n, k = row["n_univ"], row["k_raters"]
    assert k == 4
    # P_bar from the moments (binary categories)
    p_bar = (
        2 * row["sum_r2"] - 2 * k * row["sum_r"] + n * k * k - n * k
    ) / (n * k * (k - 1))
    p = row["sum_r"] / (n * k)
    p_exp = p * p + (1 - p) * (1 - p)
    assert row["p_bar"] == pytest.approx(p_bar, rel=1e-12)
    assert row["p_exp"] == pytest.approx(p_exp, rel=1e-12)
    assert row["kappa"] == pytest.approx(
        (p_bar - p_exp) / (1 - p_exp), rel=1e-12
    )
    # agreement coefficient is bounded above by 1; the union-universe
    # conditioning guarantees every item has at least one flag
    assert row["kappa"] <= 1.0
    assert row["sum_r"] >= n


# ---------------------------------------------------------------------------
# Dunn's post-hoc pairwise z
# ---------------------------------------------------------------------------


def test_dunn_posthoc_matches_bruteforce_pair(spark):
    """Pooled midranks, tie-corrected sigma^2, and z for the first
    source pair recomputed in plain Python."""
    docs = (
        tables.table(spark, SF, "documents")
        .select("source", "n_chars")
        .collect()
    )
    by_src = defaultdict(list)
    pooled = Counter()
    for r in docs:
        by_src[r["source"]].append(r["n_chars"])
        pooled[r["n_chars"]] += 1
    n = sum(pooled.values())
    # midrank per value
    mid = {}
    cum = 0
    for v in sorted(pooled):
        mid[v] = cum + (pooled[v] + 1) / 2.0
        cum += pooled[v]
    tie = sum(t**3 - t for t in pooled.values())
    sigma2 = n * (n + 1) / 12.0 - tie / (12.0 * (n - 1))
    srcs = sorted(by_src)
    a, b = srcs[0], srcs[1]
    mra = sum(mid[v] for v in by_src[a]) / len(by_src[a])
    mrb = sum(mid[v] for v in by_src[b]) / len(by_src[b])
    z = (mra - mrb) / math.sqrt(
        sigma2 * (1 / len(by_src[a]) + 1 / len(by_src[b]))
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in inference.dunn_posthoc_sources_query(spark, SF).collect()
    }
    row = out[(a, b)]
    assert row["mean_rank_a"] == pytest.approx(mra, rel=1e-12)
    assert row["mean_rank_b"] == pytest.approx(mrb, rel=1e-12)
    assert row["z"] == pytest.approx(z, rel=1e-10)
    k = len(srcs)
    assert len(out) == k * (k - 1) // 2


# ---------------------------------------------------------------------------
# Ansari-Bradley dispersion test
# ---------------------------------------------------------------------------


def test_ansari_bradley_matches_bruteforce(spark):
    """Midrank A-B scores and the without-replacement null moments
    recomputed from raw daily counts."""
    rows = (
        tables.table(spark, SF, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    days = sorted(rows, key=lambda r: r["day"])
    d0, d1 = days[0]["day"], days[-1]["day"]
    span = (d1 - d0).days + 1
    vals = [r["x"] for r in days]
    early = [2 * (r["day"] - d0).days < span for r in days]
    n = len(vals)
    pooled = Counter(vals)
    mid2 = {}
    cum = 0
    for v in sorted(pooled):
        mid2[v] = 2 * cum + pooled[v] + 1
        cum += pooled[v]
    s2 = {v: min(m, 2 * (n + 1) - m) for v, m in mid2.items()}
    ab2 = sum(s2[v] for v, e in zip(vals, early) if e)
    n_e = sum(early)
    ssum = sum(s2[v] for v in vals)
    ssq = sum(s2[v] ** 2 for v in vals)
    mu = ssum / n
    popvar = ssq / n - mu * mu
    var = n_e * (n - n_e) / (n - 1) * popvar
    row = inference.ansari_bradley_halves_query(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["n_early"] == n_e
    assert row["ab2"] == ab2
    assert row["mean_ab2"] == pytest.approx(n_e * mu, rel=1e-12)
    assert row["var_ab2"] == pytest.approx(var, rel=1e-12)
    assert row["z"] == pytest.approx(
        (ab2 - n_e * mu) / math.sqrt(var), rel=1e-9
    )


# ---------------------------------------------------------------------------
# Cochran-Mantel-Haenszel stratified association
# ---------------------------------------------------------------------------


def test_cmh_matches_bruteforce(spark):
    ev = (
        tables.table(spark, SF, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(F.to_date("ts").alias("day"), "event_type", "value")
        .collect()
    )
    strata = defaultdict(lambda: [0, 0, 0, 0])  # nk, r1, c1, a
    for r in ev:
        s = strata[r["day"]]
        s[0] += 1
        click = r["event_type"] == "click"
        high = r["value"] > 50.0
        s[1] += click
        s[2] += high
        s[3] += click and high
    sum_a = sum(s[3] for s in strata.values())
    sum_e = sum_v = 0.0
    for day in sorted(strata):
        nk, r1, c1, _ = strata[day]
        sum_e += r1 * c1 / nk
        if nk > 1:
            sum_v += (
                r1 * (nk - r1) * c1 * (nk - c1) / (nk * nk * (nk - 1))
            )
    row = inference.cmh_event_value_query(spark, SF).collect()[0]
    assert row["n_strata"] == len(strata)
    assert row["sum_a"] == sum_a
    assert row["sum_e"] == pytest.approx(sum_e, rel=1e-12)
    assert row["sum_v"] == pytest.approx(sum_v, rel=1e-12)
    assert row["cmh"] == pytest.approx(
        (sum_a - sum_e) ** 2 / sum_v, rel=1e-10
    )


# ---------------------------------------------------------------------------
# Somers' D / Kendall tau-b
# ---------------------------------------------------------------------------


def test_somers_d_matches_bruteforce(spark):
    li = (
        tables.table(spark, SF, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    orders = tables.table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("grp"),
    )
    obs = [(r["grp"], r["v"]) for r in li.join(orders, "l_orderkey").collect()]
    cells = Counter(obs)
    c_pairs = d_pairs = 0
    items = list(cells.items())
    for i, ((xa, ya), ca) in enumerate(items):
        for (xb, yb), cb in items:
            if xa < xb:
                if ya < yb:
                    c_pairs += ca * cb
                elif ya > yb:
                    d_pairs += ca * cb
    n = len(obs)
    nx = Counter(x for x, _ in obs)
    ny = Counter(y for _, y in obs)
    n0 = n * (n - 1) // 2
    tx = sum(m * (m - 1) // 2 for m in nx.values())
    ty = sum(m * (m - 1) // 2 for m in ny.values())
    row = inference.somers_d_priority_query(spark, SF).collect()[0]
    assert row["n_total"] == n
    assert row["c_pairs"] == c_pairs
    assert row["d_pairs"] == d_pairs
    assert row["tx_pairs"] == tx
    assert row["ty_pairs"] == ty
    assert row["d_yx"] == pytest.approx(
        (c_pairs - d_pairs) / (n0 - tx), rel=1e-12
    )
    assert row["d_xy"] == pytest.approx(
        (c_pairs - d_pairs) / (n0 - ty), rel=1e-12
    )
    assert row["tau_b"] == pytest.approx(
        (c_pairs - d_pairs) / math.sqrt((n0 - tx) * (n0 - ty)),
        rel=1e-12,
    )


# ---------------------------------------------------------------------------
# LSH banding planner
# ---------------------------------------------------------------------------


def test_lsh_param_plan_matches_bruteforce_banding(spark):
    """Bucket stats for every scheme recomputed in Python from the
    SAME pinned signature table the production detectors use, plus
    the S-curve's recall/cost monotonicity across schemes."""
    docs = tables.table(spark, SF, "documents")
    sigs = dedup._signature_table(docs).collect()
    out = {
        int(r["bands"]): r
        for r in dedup.lsh_param_plan_query(spark, SF).collect()
    }
    assert set(out) == {b for b, _ in dedup.LSH_SCHEMES}
    for bands, r in dedup.LSH_SCHEMES:
        buckets = Counter()
        for row in sigs:
            for bi in range(bands):
                sig = ":".join(
                    str(row[f"h{bi * r + k}"]) for k in range(r)
                )
                buckets[(bi, sig)] += 1
        got = out[bands]
        assert got["rows_per_band"] == r
        assert got["n_buckets"] == len(buckets)
        assert got["collision_buckets"] == sum(
            1 for m in buckets.values() if m > 1
        )
        assert got["max_bucket"] == max(buckets.values())
        assert got["cand_pairs"] == sum(
            m * (m - 1) // 2 for m in buckets.values()
        )
        t50, p_hit = dedup._lsh_scheme_curve(bands, r)
        assert got["t50"] == t50
        assert got["p_hit"] == p_hit
    # recall falls and join cost falls as rows-per-band grows: the
    # planner's whole point is making this dial measurable
    by_r = sorted(out.values(), key=lambda g: g["rows_per_band"])
    assert all(
        a["p_hit"] >= b["p_hit"] and a["cand_pairs"] >= b["cand_pairs"]
        for a, b in zip(by_r, by_r[1:])
    )
    # the S-curve midpoint tightens toward the threshold as r grows
    assert all(a["t50"] <= b["t50"] for a, b in zip(by_r, by_r[1:]))


# ---------------------------------------------------------------------------
# Welch's heteroscedastic ANOVA
# ---------------------------------------------------------------------------


def test_welch_anova_matches_bruteforce(spark):
    """F* and the Welch-Satterthwaite df2 recomputed with plain
    Python floats from the raw per-source samples."""
    docs = (
        tables.table(spark, SF, "documents")
        .select("source", "n_chars")
        .collect()
    )
    by_src = defaultdict(list)
    for r in docs:
        by_src[r["source"]].append(r["n_chars"])
    groups = {}
    for srcname, vs in by_src.items():
        n = len(vs)
        if n < 2:
            continue
        mean = sum(vs) / n
        var = sum((v - mean) ** 2 for v in vs) / (n - 1)
        if var <= 0:
            continue
        groups[srcname] = (n, mean, n / var)
    k = len(groups)
    w_sum = sum(w for _, _, w in groups.values())
    ybar = sum(w * m for _, m, w in groups.values()) / w_sum
    a_num = sum(w * (m - ybar) ** 2 for _, m, w in groups.values())
    h = sum(
        (1 - w / w_sum) ** 2 / (n - 1) for n, _, w in groups.values()
    )
    f = (a_num / (k - 1)) / (1 + 2 * (k - 2) / (k * k - 1) * h)
    df2 = (k * k - 1) / (3 * h)
    row = inference.welch_anova_sources_query(spark, SF).collect()[0]
    assert row["n_groups"] == k
    assert row["n_rows"] == sum(n for n, _, _ in groups.values())
    assert row["w_sum"] == pytest.approx(w_sum, rel=1e-12)
    assert row["grand_mean_w"] == pytest.approx(ybar, rel=1e-12)
    assert row["f_stat"] == pytest.approx(f, rel=1e-10)
    assert row["df2"] == pytest.approx(df2, rel=1e-10)


# ---------------------------------------------------------------------------
# Quade block-weighted rank test
# ---------------------------------------------------------------------------


def test_quade_matches_bruteforce(spark):
    """A, B, and F recomputed from the textbook definition (range-
    ranked block weights x centered within-block midranks) in plain
    Python; the emitted 4x-scaled integers reduce to the same F."""
    ev = (
        tables.table(spark, SF, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    cells = {(str(r["day"]), r["event_type"]): r["x"] for r in ev}
    days = sorted({d for d, _ in cells})
    typs = sorted({t for _, t in cells})
    k, b = len(typs), len(days)
    grid = {
        d: [cells.get((d, t), 0) for t in typs] for d in days
    }

    def midranks(vals):
        out = []
        for v in vals:
            lt = sum(1 for u in vals if u < v)
            eq = sum(1 for u in vals if u == v)
            out.append(lt + (eq + 1) / 2.0)
        return out

    qs = [max(grid[d]) - min(grid[d]) for d in days]
    w = midranks(qs)
    s = {t: 0.0 for t in typs}
    a = 0.0
    for bi, d in enumerate(days):
        r = midranks(grid[d])
        for ti, t in enumerate(typs):
            sij = w[bi] * (r[ti] - (k + 1) / 2.0)
            a += sij * sij
            s[t] += sij
    bb = sum(v * v for v in s.values()) / b
    f = (b - 1) * bb / (a - bb)
    row = inference.quade_event_mix_query(spark, SF).collect()[0]
    assert row["n_blocks"] == b
    assert row["k_treatments"] == k
    # the 4x integer scale: a4 = 16*A, b4 = 16*B
    assert row["a4"] == pytest.approx(16 * a, abs=1e-6)
    assert row["b4"] == pytest.approx(16 * bb, rel=1e-12)
    assert row["f_stat"] == pytest.approx(f, rel=1e-10)
