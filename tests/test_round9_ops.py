"""Semantic assertions for the round-9-material operators — each test
checks a property the DuckDB oracle equality can NOT express (the
oracle proves cross-engine agreement; these prove the shared answer
means what the docstring claims)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark import tables
from _kafka_streams_scaffold_spark.operators import (
    drift,
    inference,
    lexstats,
)

SF = "/root/testdata/sf0.001"


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\W+", text.lower()) if t]


# ---------------------------------------------------------------------------
# Jensen-Shannon source drift
# ---------------------------------------------------------------------------


def test_js_matches_bruteforce_python(spark):
    """The fixed-point + closed-form-tail construction must agree with
    a plain Python JSD over the full union vocabulary (the textbook
    definition) to the per-term floor precision."""
    docs = tables.table(spark, SF, "documents").select(
        "source", "text"
    ).collect()
    out = {r["source"]: r for r in
           drift.js_source_drift_query(spark, SF).collect()}
    src = sorted(out)[0]
    mine = Counter()
    rest = Counter()
    for r in docs:
        (mine if r["source"] == src else rest).update(_toks(r["text"]))
    n_s, n_r = sum(mine.values()), sum(rest.values())
    jsd = 0.0
    for t in set(mine) | set(rest):
        p = mine.get(t, 0) / n_s
        q = rest.get(t, 0) / n_r
        m = (p + q) / 2.0
        if p > 0:
            jsd += 0.5 * p * math.log(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log(q / m)
    row = out[src]
    assert row["n_src"] == n_s
    assert row["n_rest"] == n_r
    # floor() at 1e12 per present-token term: error < #terms / 1e12
    assert row["jsd"] == pytest.approx(jsd, abs=1e-6)


def test_js_bounded_by_ln2(spark):
    rows = drift.js_source_drift_query(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["jsd"] <= math.log(2.0) + 1e-9


# ---------------------------------------------------------------------------
# Good-Turing unseen mass
# ---------------------------------------------------------------------------


def test_good_turing_matches_bruteforce_counts(spark):
    docs = tables.table(spark, SF, "documents").select(
        "source", "text"
    ).collect()
    out = {r["source"]: r for r in
           lexstats.good_turing_unseen_query(spark, SF).collect()}
    src = sorted(out)[0]
    c = Counter()
    for r in docs:
        if r["source"] == src:
            c.update(_toks(r["text"]))
    cc = Counter(c.values())
    row = out[src]
    assert row["n_tokens"] == sum(c.values())
    assert row["n_terms"] == len(c)
    assert row["n1"] == cc.get(1, 0)
    assert row["n2"] == cc.get(2, 0)
    assert row["p_unseen"] == pytest.approx(cc.get(1, 0) / sum(c.values()))


def test_good_turing_agrees_with_hapax_rate(spark):
    """n1 here IS the hapax count — the two operators must agree on
    the shared statistic (they share the tokenizer by construction)."""
    gt = {r["source"]: r for r in
          lexstats.good_turing_unseen_query(spark, SF).collect()}
    hx = {r["source"]: r for r in
          lexstats.hapax_rate_query(spark, SF).collect()}
    assert set(gt) == set(hx)
    for s in gt:
        assert gt[s]["n1"] == hx[s]["n_hapax"]
        assert gt[s]["n_terms"] == hx[s]["n_terms"]


# ---------------------------------------------------------------------------
# Cross-correlation lag scan
# ---------------------------------------------------------------------------


def _daily_series(spark):
    ev = tables.table(spark, SF, "events")
    rows = sorted(
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum((F.col("event_type") == "click").cast("bigint")).alias(
                "x"
            ),
            F.sum(
                (F.col("event_type") == "purchase").cast("bigint")
            ).alias("y"),
        )
        .collect(),
        key=lambda r: r["day"],
    )
    return [r["x"] for r in rows], [r["y"] for r in rows]


def test_ccf_lag0_is_pearson(spark):
    xs, ys = _daily_series(spark)
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = math.sqrt(
        sum((x - mx) ** 2 for x in xs) * sum((y - my) ** 2 for y in ys)
    )
    out = {r["lag"]: r for r in
           inference.cross_correlation_lags_query(spark, SF).collect()}
    assert out[0]["n_overlap"] == n
    assert out[0]["ccf"] == pytest.approx(num / den)


def test_ccf_bounded_and_overlap_shrinks(spark):
    out = sorted(
        inference.cross_correlation_lags_query(spark, SF).collect(),
        key=lambda r: r["lag"],
    )
    assert [r["lag"] for r in out] == list(range(8))
    for r in out:
        assert abs(r["ccf"]) <= 1.0 + 1e-12
    # contiguous daily spine: overlap at lag k is exactly n - k
    n = out[0]["n_overlap"]
    for r in out:
        assert r["n_overlap"] == n - r["lag"]


def test_ccf_lagged_value_matches_python(spark):
    """Lag-3 cross-check against the definitional formula with
    full-series means and denominators."""
    xs, ys = _daily_series(spark)
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    k = 3
    num = sum(
        (xs[t] - mx) * (ys[t + k] - my) for t in range(n - k)
    )
    den = math.sqrt(
        sum((x - mx) ** 2 for x in xs) * sum((y - my) ** 2 for y in ys)
    )
    out = {r["lag"]: r for r in
           inference.cross_correlation_lags_query(spark, SF).collect()}
    assert out[k]["ccf"] == pytest.approx(num / den)


# ---------------------------------------------------------------------------
# SPRT sequential decision
# ---------------------------------------------------------------------------


def test_sprt_llr_matches_python_and_latches(spark):
    rows = sorted(
        inference.sprt_daily_decision_query(spark, SF).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    seen_decision = None
    for r in rows:
        want = (
            r["k_cum"] * inference._SPRT_A
            + (r["m_cum"] - r["k_cum"]) * inference._SPRT_B
        )
        assert r["llr"] == pytest.approx(want, rel=1e-12)
        if seen_decision is None:
            if r["llr"] >= inference._SPRT_UPPER:
                seen_decision = "accept_h1"
            elif r["llr"] <= inference._SPRT_LOWER:
                seen_decision = "accept_h0"
        # latch: once decided, every later day reports the decision
        assert r["state"] == (seen_decision or "continue")


def test_sprt_cumulative_counts_monotone(spark):
    rows = sorted(
        inference.sprt_daily_decision_query(spark, SF).collect(),
        key=lambda r: r["day"],
    )
    for a, b in zip(rows, rows[1:]):
        assert b["k_cum"] >= a["k_cum"]
        assert b["m_cum"] > a["m_cum"]
        assert 0 <= a["k_cum"] <= a["m_cum"]


# ---------------------------------------------------------------------------
# CUPED uplift
# ---------------------------------------------------------------------------


def _per_cust_xy(spark):
    orders = tables.table(spark, SF, "orders").collect()
    split = __import__("datetime").datetime(1998, 1, 1)
    agg = {}
    for r in orders:
        x, y = agg.setdefault(r["o_custkey"], [0, 0])
        cents = math.floor(r["o_totalprice"] * 100)
        if r["o_orderdate"] < split:
            agg[r["o_custkey"]][0] += cents
        else:
            agg[r["o_custkey"]][1] += cents
    return agg


def test_cuped_theta_matches_python_cov_over_var(spark):
    agg = _per_cust_xy(spark)
    xs = [v[0] for v in agg.values()]
    ys = [v[1] for v in agg.values()]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    var = sum((x - mx) ** 2 for x in xs)
    theta = cov / var
    rows = drift.cuped_uplift_query(spark, SF).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["theta"] == pytest.approx(theta, rel=1e-9)


def test_cuped_weighted_mean_is_preserved(spark):
    """CUPED is mean-preserving across the pooled population:
    sum_v n_v * (xbar_v - xbar_pool) = 0, so the n-weighted mean of
    the adjusted metric equals the raw pooled mean."""
    rows = drift.cuped_uplift_query(spark, SF).collect()
    n_tot = sum(r["n_users"] for r in rows)
    adj = sum(r["n_users"] * r["y_cuped"] for r in rows) / n_tot
    raw = sum(r["n_users"] * r["y_mean"] for r in rows) / n_tot
    assert adj == pytest.approx(raw, rel=1e-12)


def test_cuped_variants_partition_customers(spark):
    agg = _per_cust_xy(spark)
    rows = {r["variant"]: r for r in
            drift.cuped_uplift_query(spark, SF).collect()}
    assert rows[0]["n_users"] + rows[1]["n_users"] == len(agg)


# ---------------------------------------------------------------------------
# Markov stationary distribution
# ---------------------------------------------------------------------------


def test_markov_stationary_is_left_eigenvector(spark):
    """pi must satisfy pi = pi @ P (up to integer-floor drift of the
    12-step fixed-point iteration) for the row-normalized transition
    matrix reported by event_transitions."""
    from _kafka_streams_scaffold_spark.operators import analytics

    trans = analytics.event_transitions_query(spark, SF).collect()
    pis = {r["event_type"]: r["pi"] for r in
           analytics.markov_stationary_query(spark, SF).collect()}
    states = sorted(pis)
    p = {(r["from_type"], r["to_type"]): r["p_transition"] for r in trans}
    assert sum(pis.values()) == pytest.approx(1.0, abs=1e-9)
    for d in states:
        back = sum(pis[s] * p.get((s, d), 0.0) for s in states)
        assert back == pytest.approx(pis[d], abs=1e-4)


def test_markov_mass_conserved_up_to_floor_drift(spark):
    from _kafka_streams_scaffold_spark.operators import analytics

    rows = analytics.markov_stationary_query(spark, SF).collect()
    total = sum(r["v_fp"] for r in rows)
    scale = analytics._MARKOV_SCALE
    # each step floors once per (src -> dst) pair: up to |states|^2
    # unit losses per iteration, plus the initial uniform-split floor
    max_drift = analytics._MARKOV_ITERS * len(rows) ** 2 + len(rows)
    assert scale - max_drift <= total <= scale


# ---------------------------------------------------------------------------
# Hill tail index
# ---------------------------------------------------------------------------


def test_hill_matches_bruteforce_python(spark):
    docs = tables.table(spark, SF, "documents").select(
        "source", "n_chars"
    ).collect()
    out = {r["source"]: r for r in
           lexstats.hill_tail_index_query(spark, SF).collect()}
    src = sorted(out)[0]
    xs = sorted(
        (r["n_chars"] for r in docs
         if r["source"] == src and r["n_chars"] > 0),
        reverse=True,
    )
    k = max(2, len(xs) // 5)
    hill = sum(math.log(xs[i]) for i in range(k)) / k - math.log(xs[k])
    row = out[src]
    assert row["n_docs"] == len(xs)
    assert row["k"] == k
    assert row["x_k1"] == xs[k]
    # per-term 1e9 fixed-point floor: error < k/1e9/k = 1e-9
    assert row["hill"] == pytest.approx(hill, abs=1e-8)
    if hill > 0:
        assert row["alpha"] == pytest.approx(1.0 / hill, rel=1e-7)


def test_hill_positive_on_all_sources(spark):
    rows = lexstats.hill_tail_index_query(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["hill"] > 0
        assert r["k"] >= 2
        assert r["x_k1"] >= 1


# ---------------------------------------------------------------------------
# PSI drift score
# ---------------------------------------------------------------------------


def test_psi_matches_python_recomputation(spark):
    from _kafka_streams_scaffold_spark.operators import dq

    rows = dq.psi_drift_score_query(spark, SF).collect()
    t_base = sum(r["n_baseline"] for r in rows)
    t_cur = sum(r["n_current"] for r in rows)
    b = len(rows)
    for r in rows:
        p = (r["n_baseline"] + 1) / (t_base + b)
        q = (r["n_current"] + 1) / (t_cur + b)
        want = math.floor(1e12 * (q - p) * math.log(q / p))
        assert r["term_fp"] == want
        # pointwise PSI contribution is nonnegative up to the floor
        assert r["term_fp"] >= -1


def test_psi_agrees_with_chi2_bucketing(spark):
    """Same split, same bins: the two drift audits must agree on the
    per-bucket counts exactly."""
    from _kafka_streams_scaffold_spark.operators import dq

    psi = {r["bucket"]: r for r in
           dq.psi_drift_score_query(spark, SF).collect()}
    chi = {r["bucket"]: r for r in
           dq.distribution_drift_query(spark, SF).collect()}
    assert set(psi) == set(chi)
    for k in psi:
        assert psi[k]["n_baseline"] == chi[k]["n_baseline"]
        assert psi[k]["n_current"] == chi[k]["n_current"]


# ---------------------------------------------------------------------------
# Difference-in-differences
# ---------------------------------------------------------------------------


def test_did_identity_and_cuped_coherence(spark):
    r = drift.did_uplift_query(spark, SF).collect()[0]
    assert r["did"] == pytest.approx(
        (r["post_b"] - r["pre_b"]) - (r["post_a"] - r["pre_a"]), rel=1e-12
    )
    assert r["uplift_naive"] == pytest.approx(
        r["post_b"] - r["post_a"], rel=1e-12
    )
    cuped = {c["variant"]: c for c in
             drift.cuped_uplift_query(spark, SF).collect()}
    assert r["n_a"] == cuped[0]["n_users"]
    assert r["n_b"] == cuped[1]["n_users"]
    assert r["post_a"] == pytest.approx(cuped[0]["y_mean"], rel=1e-12)
    assert r["post_b"] == pytest.approx(cuped[1]["y_mean"], rel=1e-12)
    assert r["pre_a"] == pytest.approx(cuped[0]["x_mean"], rel=1e-12)


# ---------------------------------------------------------------------------
# Burrows' Delta
# ---------------------------------------------------------------------------


def test_burrows_delta_matches_bruteforce_pair(spark):
    docs = tables.table(spark, SF, "documents").select(
        "source", "text"
    ).collect()
    per_src = {}
    pooled = Counter()
    for r in docs:
        c = per_src.setdefault(r["source"], Counter())
        toks = _toks(r["text"])
        c.update(toks)
        pooled.update(toks)
    top = [
        t for t, _ in sorted(
            pooled.items(), key=lambda kv: (-kv[1], kv[0])
        )[:150]
    ]
    srcs = sorted(per_src)
    ns = len(srcs)
    totals = {s: sum(per_src[s].values()) for s in srcs}
    f_fp = {
        (s, t): (10**12 * per_src[s].get(t, 0)) // totals[s]
        for s in srcs for t in top
    }
    zs = {}
    surviving = []
    for t in top:
        sf = sum(f_fp[(s, t)] for s in srcs)
        sff = sum(f_fp[(s, t)] ** 2 for s in srcs)
        den2 = float(ns) * float(sff) - float(sf) * float(sf)
        if den2 <= 0:
            continue
        surviving.append(t)
        for s in srcs:
            zs[(s, t)] = (ns * f_fp[(s, t)] - sf) / math.sqrt(den2)
    a, b = srcs[0], srcs[1]
    want_fp = sum(
        math.floor(1e9 * abs(zs[(a, t)] - zs[(b, t)])) for t in surviving
    )
    out = {(r["src_a"], r["src_b"]): r for r in
           lexstats.burrows_delta_query(spark, SF).collect()}
    row = out[(a, b)]
    assert row["n_terms"] == len(surviving)
    assert row["delta_fp"] == want_fp
    assert row["delta"] == pytest.approx(
        want_fp / 1e9 / len(surviving), rel=1e-12
    )


def test_burrows_delta_pair_universe(spark):
    rows = lexstats.burrows_delta_query(spark, SF).collect()
    # 20 sources -> C(20,2) unordered pairs
    assert len(rows) == 190
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert r["delta"] >= 0.0
        assert r["n_terms"] <= 150


# ---------------------------------------------------------------------------
# Cochran's Q across the four dedup detectors
# ---------------------------------------------------------------------------


def test_cochran_q_moment_identities(spark):
    from _kafka_streams_scaffold_spark.operators import dedup

    r = dedup.detector_cochran_q_query(spark, SF).collect()[0]
    ts = [r["t_simhash"], r["t_minhash"], r["t_ngram"], r["t_edit"]]
    # column totals and row totals count the same flag matrix
    assert sum(ts) == r["sum_r"]
    # every union-universe pair carries between 1 and 4 flags
    assert r["n_univ"] <= r["sum_r"] <= 4 * r["n_univ"]
    assert r["sum_r"] <= r["sum_r2"] <= 4 * r["sum_r"]
    # recompute Q from the reported moments
    k = 4
    den = k * r["sum_r"] - r["sum_r2"]
    if den > 0:
        want = (
            (k - 1)
            * (k * sum(t * t for t in ts) - sum(ts) ** 2)
            / den
        )
        assert r["q"] == pytest.approx(want, rel=1e-12)
    assert r["q"] >= 0.0


def test_cochran_q_reduces_to_mcnemar_shape(spark):
    """With the 2-detector margins from the agreement audit, Q's
    column totals must match the per-tier pair-set sizes."""
    from _kafka_streams_scaffold_spark.operators import dedup

    q = dedup.detector_cochran_q_query(spark, SF).collect()[0]
    agree = dedup.dedup_tier_agreement_query(spark, SF).collect()
    n_by_tier = {}
    for row in agree:
        n_by_tier[row["tier_a"]] = row["n_a"]
        n_by_tier[row["tier_b"]] = row["n_b"]
    for t in ("simhash", "minhash", "ngram", "edit"):
        assert q[f"t_{t}"] == n_by_tier[t]


# ---------------------------------------------------------------------------
# Contrastive in-batch collision rate
# ---------------------------------------------------------------------------


def test_collision_rate_matches_cluster_sizes(spark):
    from _kafka_streams_scaffold_spark.operators import clustering

    labels = clustering.dedup_clusters_query(spark, SF).collect()
    sizes = Counter(r["cluster_id"] for r in labels)
    n = len(labels)
    mass = sum(c * (c - 1) for c in sizes.values())
    r = clustering.contrastive_collision_query(spark, SF).collect()[0]
    assert r["n_docs"] == n
    assert r["n_clusters"] == len(sizes)
    assert r["n_multi"] == sum(1 for c in sizes.values() if c > 1)
    assert r["same_pair_mass"] == mass
    assert r["p_collision"] == pytest.approx(mass / (n * (n - 1)))
    assert r["exp_dups_per_batch"] == pytest.approx(
        (1024 * 1023 / 2) * mass / (n * (n - 1))
    )


# ---------------------------------------------------------------------------
# Revenue attribution
# ---------------------------------------------------------------------------


def test_attribution_models_conserve_revenue(spark):
    from _kafka_streams_scaffold_spark.operators import analytics

    rows = analytics.revenue_attribution_query(spark, SF).collect()
    by_model = {}
    for r in rows:
        m = by_model.setdefault(r["model"], {"n": 0, "cents": 0})
        m["n"] += r["n_purchases"]
        m["cents"] += r["cents"]
    # both models attribute every purchase exactly once
    assert by_model["first"]["n"] == by_model["last"]["n"]
    assert by_model["first"]["cents"] == by_model["last"]["cents"]


def test_attribution_matches_bruteforce_python(spark):
    from _kafka_streams_scaffold_spark.operators import analytics

    ev = sorted(
        tables.table(spark, SF, "events").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    first_tot = Counter()
    last_tot = Counter()
    hist = {}
    for r in ev:
        u = r["user_id"]
        st = hist.setdefault(u, {"first": None, "last": None})
        if r["event_type"] == "purchase":
            cents = math.floor(r["value"] * 100)
            first_tot[st["first"] or "none"] += cents
            last_tot[st["last"] or "none"] += cents
        else:
            if st["first"] is None:
                st["first"] = r["event_type"]
            st["last"] = r["event_type"]
    out = {(r["model"], r["channel"]): r["cents"] for r in
           analytics.revenue_attribution_query(spark, SF).collect()}
    for ch, cents in first_tot.items():
        assert out[("first", ch)] == cents
    for ch, cents in last_tot.items():
        assert out[("last", ch)] == cents


# ---------------------------------------------------------------------------
# Nearest-centroid confusion
# ---------------------------------------------------------------------------


def test_ncc_confusion_rows_partition_vectors(spark):
    from _kafka_streams_scaffold_spark.operators import similarity

    rows = similarity.ncc_confusion_query(spark, SF).collect()
    n_emb = tables.table(spark, SF, "embeddings").count()
    assert sum(r["n"] for r in rows) == n_emb
    by_row = {}
    for r in rows:
        by_row.setdefault(r["orig_label"], []).append(r)
        assert r["is_correct"] == (r["orig_label"] == r["assigned_label"])
    for _, cells in by_row.items():
        assert sum(c["row_frac"] for c in cells) == pytest.approx(1.0)


def test_ncc_agrees_with_ivf_assign(spark):
    from _kafka_streams_scaffold_spark.operators import similarity

    assign = similarity.ivf_assign_query(spark, SF).collect()
    want = Counter(
        (r["orig_label"], r["assigned_label"]) for r in assign
    )
    got = {
        (r["orig_label"], r["assigned_label"]): r["n"]
        for r in similarity.ncc_confusion_query(spark, SF).collect()
    }
    assert got == dict(want)


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction
# ---------------------------------------------------------------------------


def test_adamic_adar_matches_bruteforce(spark):
    from _kafka_streams_scaffold_spark.operators import similarity

    edges = [
        (r["vec_id"], r["nbr_id"])
        for r in similarity.knn_graph_query(spark, SF).collect()
    ]
    out_nbrs = {}
    indeg = Counter()
    for q, n in edges:
        out_nbrs.setdefault(q, set()).add(n)
        indeg[n] += 1
    want = {}
    nodes = sorted(out_nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            common = out_nbrs[a] & out_nbrs[b]
            if not common:
                continue
            aa_fp = sum(
                math.floor(1e9 / math.log(indeg[z])) for z in common
            )
            want[(a, b)] = (len(common), aa_fp)
    got = {
        (r["vec_a"], r["vec_b"]): (r["cn"], r["aa_fp"])
        for r in similarity.adamic_adar_links_query(spark, SF).collect()
    }
    assert got == want


def test_adamic_adar_score_monotone_in_common_neighbors(spark):
    from _kafka_streams_scaffold_spark.operators import similarity

    rows = similarity.adamic_adar_links_query(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["cn"] >= 1
        assert r["aa"] > 0
        # each term is at most 1/ln(2), at least 1/ln(indeg_max)
        assert r["aa"] <= r["cn"] / math.log(2.0) + 1e-9


# ---------------------------------------------------------------------------
# Audience overlap
# ---------------------------------------------------------------------------


def test_audience_overlap_matches_bruteforce(spark):
    from _kafka_streams_scaffold_spark.operators import analytics

    ev = tables.table(spark, SF, "events").select(
        "user_id", "event_type"
    ).collect()
    users = {}
    for r in ev:
        users.setdefault(r["event_type"], set()).add(r["user_id"])
    types = sorted(users)
    out = {(r["type_a"], r["type_b"]): r for r in
           analytics.audience_overlap_query(spark, SF).collect()}
    assert len(out) == len(types) * (len(types) - 1) // 2
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            both = len(users[a] & users[b])
            row = out[(a, b)]
            assert row["n_a"] == len(users[a])
            assert row["n_b"] == len(users[b])
            assert row["n_both"] == both
            assert row["jaccard"] == pytest.approx(
                both / len(users[a] | users[b])
            )


# ---------------------------------------------------------------------------
# Token entropy / evenness
# ---------------------------------------------------------------------------


def test_token_entropy_matches_bruteforce(spark):
    docs = tables.table(spark, SF, "documents").select(
        "source", "text"
    ).collect()
    out = {r["source"]: r for r in
           lexstats.token_entropy_query(spark, SF).collect()}
    src = sorted(out)[0]
    c = Counter()
    for r in docs:
        if r["source"] == src:
            c.update(_toks(r["text"]))
    n = sum(c.values())
    h = sum((ci / n) * math.log(n / ci) for ci in c.values())
    row = out[src]
    assert row["n_tokens"] == n
    assert row["n_terms"] == len(c)
    # per-term floor at 1e6: absolute error < n_terms * max(c)/n/1e6
    assert row["entropy_nats"] == pytest.approx(h, abs=1e-4)
    assert 0.0 <= row["evenness"] <= 1.0 + 1e-9
    assert row["evenness"] == pytest.approx(
        row["entropy_nats"] / math.log(len(c)), rel=1e-9
    )


# ---------------------------------------------------------------------------
# Q-Q shift profile
# ---------------------------------------------------------------------------


def test_qq_quantiles_match_bruteforce_type1(spark):
    docs = tables.table(spark, SF, "documents").select(
        "source", "n_chars"
    ).collect()
    out = {(r["source"], r["p"]): r for r in
           inference.qq_shift_profile_query(spark, SF).collect()}
    pooled = sorted(r["n_chars"] for r in docs)

    def q1(xs, p):
        rank = (p * len(xs) + 99) // 100
        return xs[rank - 1]

    srcs = sorted({r["source"] for r in docs})
    for src in srcs[:3]:
        xs = sorted(r["n_chars"] for r in docs if r["source"] == src)
        for p in (10, 25, 50, 75, 90):
            row = out[(src, p)]
            assert row["n_src"] == len(xs)
            assert row["src_q"] == q1(xs, p)
            assert row["pool_q"] == q1(pooled, p)
            assert row["shift"] == q1(xs, p) - q1(pooled, p)


def test_qq_profile_complete_and_monotone(spark):
    rows = inference.qq_shift_profile_query(spark, SF).collect()
    # 20 sources x 5 quantiles
    assert len(rows) == 100
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["p"]] = r["src_q"]
    for _, qs in by_src.items():
        vals = [qs[p] for p in (10, 25, 50, 75, 90)]
        assert vals == sorted(vals)


# ---------------------------------------------------------------------------
# Log-rank cohorts
# ---------------------------------------------------------------------------


def test_logrank_matches_bruteforce_python(spark):
    from _kafka_streams_scaffold_spark.operators import stats

    ev = tables.table(spark, SF, "events").select(
        "user_id", "ts"
    ).collect()
    us_per_day = stats._US_PER_DAY
    first = {}
    last = {}
    for r in ev:
        us = int(r["ts"].timestamp() * 1e6)
        u = r["user_id"]
        first[u] = min(first.get(u, us), us)
        last[u] = max(last.get(u, us), us)
    horizon = max(last.values())
    lived = []
    for u in first:
        t = (last[u] - first[u]) // us_per_day
        censored = (horizon - last[u]) // us_per_day < stats.KM_CENSOR_DAYS
        lived.append((u % 2, t, censored))
    times = sorted({t for _, t, _ in lived})
    na = sum(1 for g, _, _ in lived if g == 0)
    nb = len(lived) - na
    r0, r1 = na, nb
    u_fp = v_fp = 0
    n_times = d_total = 0
    for t in times:
        d0 = sum(1 for g, tt, c in lived if g == 0 and tt == t and not c)
        d1 = sum(1 for g, tt, c in lived if g == 1 and tt == t and not c)
        a0 = sum(1 for g, tt, _ in lived if g == 0 and tt == t)
        a1 = sum(1 for g, tt, _ in lived if g == 1 and tt == t)
        d, n = d0 + d1, r0 + r1
        if d > 0 and n > 1:
            n_times += 1
            d_total += d
            ome = (d0 * n - d * r0) / n
            var = (d * r0) * (r1 * (n - d)) / (n * n) / (n - 1)
            u_fp += math.floor(1e9 * ome)
            v_fp += math.floor(1e9 * var)
        r0 -= a0
        r1 -= a1
    row = inference.logrank_cohorts_query(spark, SF).collect()[0]
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["n_times"] == n_times
    assert row["d_total"] == d_total
    assert row["ome_fp"] == u_fp
    assert row["var_fp"] == v_fp
    if v_fp > 0:
        assert row["chi2"] == pytest.approx(
            (u_fp / 1e9) ** 2 / (v_fp / 1e9), rel=1e-9
        )


# ---------------------------------------------------------------------------
# SMD balance audit
# ---------------------------------------------------------------------------


def test_smd_matches_bruteforce_python(spark):
    import statistics

    orders = tables.table(spark, SF, "orders").collect()
    cust = tables.table(spark, SF, "customer").collect()
    split = __import__("datetime").datetime(1998, 1, 1)
    pre = Counter()
    cnt = Counter()
    for r in orders:
        if r["o_orderdate"] < split:
            pre[r["o_custkey"]] += math.floor(r["o_totalprice"] * 100)
            # pre-period only — the covariate must be pre-treatment
            cnt[r["o_custkey"]] += 1
    panel = {"pre_spend_cents": {}, "n_orders": {}, "acctbal_cents": {}}
    for c in cust:
        k = c["c_custkey"]
        v = k % 2
        panel["pre_spend_cents"].setdefault(v, []).append(pre.get(k, 0))
        panel["n_orders"].setdefault(v, []).append(cnt.get(k, 0))
        panel["acctbal_cents"].setdefault(v, []).append(
            math.floor(c["c_acctbal"] * 100)
        )
    out = {r["covariate"]: r for r in
           drift.smd_balance_audit_query(spark, SF).collect()}
    assert set(out) == set(panel)
    for cov, arms in panel.items():
        row = out[cov]
        a, b = arms[0], arms[1]
        assert row["n_a"] == len(a) and row["n_b"] == len(b)
        assert row["mean_a"] == pytest.approx(sum(a) / len(a), rel=1e-12)
        assert row["mean_b"] == pytest.approx(sum(b) / len(b), rel=1e-12)
        va, vb = statistics.variance(a), statistics.variance(b)
        pooled = math.sqrt((va + vb) / 2)
        want = (sum(b) / len(b) - sum(a) / len(a)) / pooled
        assert row["smd"] == pytest.approx(want, rel=1e-6)


# ---------------------------------------------------------------------------
# Little's law audit
# ---------------------------------------------------------------------------


def test_littles_gap_is_exactly_zero(spark):
    from _kafka_streams_scaffold_spark.operators import analytics

    rows = analytics.littles_law_audit_query(spark, SF).collect()
    assert rows
    for r in rows:
        # the sweep integral and the duration sum are independent
        # derivations of the same integer quantity
        assert r["littles_gap"] == 0
        assert r["busy_us_sweep"] == r["busy_us_durations"]
        assert r["mean_concurrency"] > 0
        assert r["mean_duration_s"] == pytest.approx(
            r["busy_us_durations"] / r["n_sessions"] / 1e6
        )


def test_littles_agrees_with_session_concurrency_counts(spark):
    from _kafka_streams_scaffold_spark.operators import analytics

    lit_rows = {r["day"]: r for r in
                analytics.littles_law_audit_query(spark, SF).collect()}
    conc = {
        int(
            r["day"].toordinal()
            - __import__("datetime").date(1970, 1, 1).toordinal()
        ): r
        for r in analytics.session_concurrency_query(spark, SF).collect()
    }
    assert set(lit_rows) == set(conc)
    for d, r in lit_rows.items():
        assert r["n_sessions"] == conc[d]["n_sessions"]
        # the time-average concurrency can never exceed the peak
        assert r["mean_concurrency"] <= conc[d]["max_concurrent"] + 1e-9


# ---------------------------------------------------------------------------
# Binary segmentation
# ---------------------------------------------------------------------------


def test_binseg_root_matches_bruteforce_and_children_nest(spark):
    from _kafka_streams_scaffold_spark.operators import stats as stats_mod

    ev = tables.table(spark, SF, "events").filter(
        F.col("event_type") == "purchase"
    ).select(F.to_date("ts").alias("day")).collect()
    daily = Counter(r["day"] for r in ev)
    days = sorted(daily)
    n, s = len(days), sum(daily.values())

    def best(sub):
        ns, ss = len(sub), sum(daily[d] for d in sub)
        prefix, out = 0, None
        for i, d in enumerate(sub, start=1):
            prefix += daily[d]
            c = ns * prefix - i * ss
            if out is None or abs(c) > abs(out[1]):
                out = (d, c, ns)
        return out

    rows = {(r["level"], r["segment"]): r for r in
            stats_mod.binseg_changepoints_query(spark, SF).collect()}
    root = rows[(1, "root")]
    want_root = best(days)
    assert root["changepoint_day"] == want_root[0]
    assert root["cusum_scaled"] == want_root[1]
    assert root["n_days"] == n
    cp = root["changepoint_day"]
    left = [d for d in days if d <= cp]
    right = [d for d in days if d > cp]
    for seg, sub in (("left", left), ("right", right)):
        if not sub:
            continue
        row = rows[(2, seg)]
        want = best(sub)
        assert row["changepoint_day"] == want[0]
        assert row["cusum_scaled"] == want[1]
        assert row["n_days"] == len(sub)


# ---------------------------------------------------------------------------
# Discount elasticity
# ---------------------------------------------------------------------------


def test_elasticity_matches_bruteforce_ols(spark):
    from _kafka_streams_scaffold_spark.operators import trade

    li = tables.table(spark, SF, "lineitem").select(
        "l_returnflag", "l_discount", "l_quantity"
    ).collect()
    pts = {}
    for r in li:
        pts.setdefault(r["l_returnflag"], []).append(
            (math.floor(r["l_discount"] * 100),
             math.floor(r["l_quantity"]))
        )
    out = {r["l_returnflag"]: r for r in
           trade.discount_elasticity_query(spark, SF).collect()}
    for flag, xy in pts.items():
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxx = sum(x * x for x, _ in xy)
        sxy = sum(x * y for x, y in xy)
        cov, vx = n * sxy - sx * sy, n * sxx - sx * sx
        row = out[flag]
        assert row["n"] == n
        assert row["mean_qty"] == pytest.approx(sy / n, rel=1e-12)
        assert row["slope"] == pytest.approx(cov / vx, rel=1e-9)
        assert -1e-9 <= row["r2"] <= 1 + 1e-9


# ---------------------------------------------------------------------------
# TPC-H analog fill-ins: Q13 / Q14 / Q17 / Q19
# ---------------------------------------------------------------------------


def test_q13_distribution_counts_all_customers(spark):
    from _kafka_streams_scaffold_spark.operators import trade

    rows = trade.cust_order_dist_query(spark, SF).collect()
    n_cust = tables.table(spark, SF, "customer").count()
    assert sum(r["custdist"] for r in rows) == n_cust
    # the left join preserves zero-order customers iff any exist
    orders = tables.table(spark, SF, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey").distinct().count()
    zero = {r["c_count"]: r["custdist"] for r in rows}.get(0, 0)
    assert zero == n_cust - orders


def test_q14_share_matches_bruteforce(spark):
    from _kafka_streams_scaffold_spark.operators import trade

    import datetime as dt
    li = tables.table(spark, SF, "lineitem").collect()
    part = {r["p_partkey"]: r["p_type"] for r in
            tables.table(spark, SF, "part").collect()}
    lo, hi = dt.datetime(1995, 9, 1), dt.datetime(1995, 10, 1)
    promo = total = 0.0
    for r in li:
        if lo <= r["l_shipdate"] < hi:
            rev = round(r["l_extendedprice"], 2) * (
                1 - round(r["l_discount"], 2)
            )
            total += rev
            if part[r["l_partkey"]] == "PROMO":
                promo += rev
    row = trade.promo_revenue_share_query(spark, SF).collect()[0]
    assert row["total_revenue"] == pytest.approx(total, rel=1e-9)
    assert row["promo_revenue"] == pytest.approx(promo, rel=1e-9)
    assert row["promo_share_pct"] == pytest.approx(
        100 * promo / total, rel=1e-9
    )


def test_q17_threshold_is_exact_cross_multiplied(spark):
    from _kafka_streams_scaffold_spark.operators import trade

    li = tables.table(spark, SF, "lineitem").collect()
    brand_parts = {
        r["p_partkey"] for r in tables.table(spark, SF, "part").collect()
        if r["p_brand"] == "Brand#12"
    }
    per_part = {}
    for r in li:
        if r["l_partkey"] in brand_parts:
            s = per_part.setdefault(r["l_partkey"], [0.0, 0])
            s[0] += r["l_quantity"]
            s[1] += 1
    n = 0
    ext = 0.0
    for r in li:
        if r["l_partkey"] in brand_parts:
            sq, nl = per_part[r["l_partkey"]]
            if 5 * r["l_quantity"] * nl < sq:
                n += 1
                ext += round(r["l_extendedprice"], 2)
    row = trade.small_qty_revenue_query(spark, SF).collect()[0]
    assert row["n_lineitems"] == n
    if n:
        assert row["total_extprice"] == pytest.approx(ext, rel=1e-9)
        assert row["avg_yearly"] == pytest.approx(ext / 7.0, rel=1e-9)


def test_q19_or_branches_match_bruteforce(spark):
    from _kafka_streams_scaffold_spark.operators import trade

    li = tables.table(spark, SF, "lineitem").collect()
    part = {r["p_partkey"]: r for r in
            tables.table(spark, SF, "part").collect()}
    n = 0
    rev = 0.0
    for r in li:
        p = part[r["l_partkey"]]
        q = r["l_quantity"]
        hit = (
            (p["p_brand"] == "Brand#12" and 1 <= p["p_size"] <= 15
             and 1 <= q <= 11)
            or (p["p_brand"] == "Brand#23" and 1 <= p["p_size"] <= 25
                and 10 <= q <= 20)
            or (p["p_brand"] == "Brand#34" and 1 <= p["p_size"] <= 35
                and 20 <= q <= 30)
        )
        if hit:
            n += 1
            rev += round(r["l_extendedprice"], 2) * (
                1 - round(r["l_discount"], 2)
            )
    row = trade.branded_basket_revenue_query(spark, SF).collect()[0]
    assert row["n_lineitems"] == n
    assert (row["revenue"] or 0.0) == pytest.approx(rev, rel=1e-9)


# ---------------------------------------------------------------------------
# Davies-Bouldin / streaks / fulfillment lag
# ---------------------------------------------------------------------------


def test_davies_bouldin_matches_bruteforce(spark):
    from _kafka_streams_scaffold_spark.operators import similarity

    emb = tables.table(spark, SF, "embeddings").collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(
            [float(x) for x in r["embedding"]]
        )
    dim = len(emb[0]["embedding"])
    cents = {}
    for lab, vecs in by_label.items():
        fps = [
            sum(math.floor(v[i] * 1_000_000) for v in vecs)
            for i in range(dim)
        ]
        cents[lab] = [
            fp / (len(vecs) * 1_000_000) for fp in fps
        ]
    s = {}
    for lab, vecs in by_label.items():
        tot = 0
        for v in vecs:
            d = math.sqrt(
                sum((v[i] - cents[lab][i]) ** 2 for i in range(dim))
            )
            tot += math.floor(1e9 * d)
        s[lab] = tot / len(vecs) / 1e9
    out = {r["label"]: r for r in
           similarity.davies_bouldin_query(spark, SF).collect()}
    for lab in by_label:
        best = None
        for other in by_label:
            if other == lab:
                continue
            dc = math.sqrt(
                sum(
                    (cents[lab][i] - cents[other][i]) ** 2
                    for i in range(dim)
                )
            )
            ratio = (s[lab] + s[other]) / dc
            if best is None or ratio > best[1] + 1e-15:
                best = (other, ratio)
        row = out[lab]
        assert row["n_vecs"] == len(by_label[lab])
        assert row["s_mean"] == pytest.approx(s[lab], rel=1e-9)
        assert row["worst_label"] == best[0]
        assert row["db_ratio"] == pytest.approx(best[1], rel=1e-9)


def test_streaks_partition_users_and_match_bruteforce(spark):
    from _kafka_streams_scaffold_spark.operators import analytics

    ev = tables.table(spark, SF, "events").select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("d")
    ).collect()
    days = {}
    for r in ev:
        days.setdefault(r["user_id"], set()).add(r["d"])
    want = Counter()
    for _, ds in days.items():
        ds = sorted(ds)
        best = cur = 1
        for a, b in zip(ds, ds[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        want[best] += 1
    rows = analytics.activity_streaks_query(spark, SF).collect()
    got = {r["max_streak"]: r["n_users"] for r in rows}
    assert got == dict(want)
    assert sum(r["n_users"] for r in rows) == len(days)
    assert sum(r["frac_users"] for r in rows) == pytest.approx(1.0)


def test_fulfillment_lag_quantiles_match_bruteforce(spark):
    from _kafka_streams_scaffold_spark.operators import trade

    li = tables.table(spark, SF, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect()
    orders = {r["o_orderkey"]: r for r in
              tables.table(spark, SF, "orders").collect()}
    lags = {}
    for r in li:
        o = orders[r["l_orderkey"]]
        lag = (r["l_shipdate"].date() - o["o_orderdate"].date()).days
        lags.setdefault(o["o_orderpriority"], []).append(lag)
    out = {(r["o_orderpriority"], r["p"]): r for r in
           trade.fulfillment_lag_query(spark, SF).collect()}
    for prio, xs in lags.items():
        xs = sorted(xs)
        for p in (25, 50, 75, 90, 99):
            rank = (p * len(xs) + 99) // 100
            row = out[(prio, p)]
            assert row["n_lineitems"] == len(xs)
            assert row["lag_q"] == xs[rank - 1]
    # quantiles are monotone in p within each priority (the synthetic
    # generator does NOT enforce shipdate >= orderdate, so negative
    # lags are a data property, not an operator property)
    for prio in lags:
        qs = [out[(prio, p)]["lag_q"] for p in (25, 50, 75, 90, 99)]
        assert qs == sorted(qs)


# ---------------------------------------------------------------------------
# Cell label Gini
# ---------------------------------------------------------------------------


def test_cell_gini_matches_ncc_confusion_columns(spark):
    """The cell x label counts here are the TRANSPOSE of the NCC
    confusion matrix — the two operators must agree on every cell."""
    from _kafka_streams_scaffold_spark.operators import similarity

    conf = similarity.ncc_confusion_query(spark, SF).collect()
    by_cell = {}
    for r in conf:
        by_cell.setdefault(r["assigned_label"], {})[r["orig_label"]] = r[
            "n"
        ]
    out = {r["cell"]: r for r in
           similarity.cell_label_gini_query(spark, SF).collect()}
    assert set(out) == set(by_cell)
    for cell, counts in by_cell.items():
        row = out[cell]
        n = sum(counts.values())
        assert row["n_vecs"] == n
        assert row["n_labels"] == len(counts)
        assert row["gini_num"] == n * n - sum(
            v * v for v in counts.values()
        )
        assert row["gini"] == pytest.approx(
            1 - sum((v / n) ** 2 for v in counts.values())
        )
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert row["majority_label"] == best[0]
        assert 0.0 <= row["gini"] < 1.0
