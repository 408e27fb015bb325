"""Round-5 batch 6: binary (1-bit) quantization tier, Kneser-Ney
bigram smoothing, and LOF density-ratio outliers."""

from __future__ import annotations

import math
import re

from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import lm, quantize, similarity


def _emb_df(spark, vecs, labels=None):
    labels = labels or [0] * len(vecs)
    return spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[float(x) for x in v], label=int(l))
            for i, (v, l) in enumerate(zip(vecs, labels))
        ]
    )


# ---- binary_signatures ---------------------------------------------------


def test_binary_signature_packs_known_bits(spark, monkeypatch):
    # dims [+, -, 0, +] -> bits 0 and 3 set in the low word: 1 + 8 = 9
    df = _emb_df(spark, [[1.0, -1.0, 0.0, 2.0]])
    monkeypatch.setattr(quantize.tables, "table", lambda *a: df)
    r = quantize.binary_signatures_query(spark, "_").collect()[0]
    assert (r["sig_lo"], r["sig_hi"], r["n_pos"]) == (9, 0, 2)


def test_binary_signature_high_word_and_top_bit(spark, monkeypatch):
    # 64 dims: only dim 33 (1-based; word 2, bit 0) and dim 64 (word 2,
    # bit 31) positive -> hi = 1 + 2^31, lo = 0. The top bit of the
    # 32-bit word never touches the BIGINT sign bit.
    v = [0.0] * 64
    v[32] = 1.0  # 0-based index 32 == dim 33
    v[63] = 1.0
    df = _emb_df(spark, [v])
    monkeypatch.setattr(quantize.tables, "table", lambda *a: df)
    r = quantize.binary_signatures_query(spark, "_").collect()[0]
    assert (r["sig_lo"], r["sig_hi"]) == (0, 1 + 2**31)
    assert r["n_pos"] == 2


# ---- binary_ann ----------------------------------------------------------


def test_binary_ann_ranks_by_hamming_with_id_ties(spark, monkeypatch):
    base = [1.0, 1.0, 1.0, 1.0]
    one_flip = [1.0, 1.0, 1.0, -1.0]
    two_flip = [1.0, 1.0, -1.0, -1.0]
    df = _emb_df(spark, [base, one_flip, two_flip, one_flip])
    monkeypatch.setattr(quantize.tables, "table", lambda *a: df)
    rows = {
        (r["q_id"], r["rank"]): (r["n_id"], r["hamming"])
        for r in quantize.binary_ann_query(spark, "_").collect()
    }
    # q 0: hamming 1 to vecs 1 and 3 (tie -> lower id first), then 2
    assert rows[(0, 1)] == (1, 1)
    assert rows[(0, 2)] == (3, 1)
    assert rows[(0, 3)] == (2, 2)


def test_binary_ann_recall_bounds_and_exact_k(spark, sf_dir):
    rows = quantize.binary_ann_recall_query(spark, sf_dir).collect()
    assert len(rows) == quantize.N_QUERIES
    for r in rows:
        assert r["n_exact"] == quantize.TOP_K
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_hits"] <= r["n_exact"]


# ---- kneser_ney_bigram ---------------------------------------------------


def _brute_kn(texts, min_count):
    """Reference KN from raw python: mirrors the operator's tokenizer
    and the integer-ratio discount d = 3/4."""
    c2: dict[tuple[str, str], int] = {}
    for t in texts:
        toks = [w for w in re.split(r"\W+", t.lower()) if w]
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    ctx_n: dict[str, int] = {}
    n1_ctx: dict[str, int] = {}
    n1_next: dict[str, int] = {}
    for (a, b), c in c2.items():
        ctx_n[a] = ctx_n.get(a, 0) + c
        n1_ctx[a] = n1_ctx.get(a, 0) + 1
        n1_next[b] = n1_next.get(b, 0) + 1
    t_types = len(c2)
    out = {}
    for (a, b), c in c2.items():
        if ctx_n[a] < min_count:
            continue
        num = (4 * c - 3) * t_types + 3 * n1_ctx[a] * n1_next[b]
        den = 4 * ctx_n[a] * t_types
        out[(a, b)] = num / den
    return out


def test_kneser_ney_matches_brute_force(spark, monkeypatch):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "the cat ate the fish",
        "a cat and a dog and a fish",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    monkeypatch.setattr(lm.tables, "table", lambda *a: df)
    got = {
        (r["token"], r["next_token"]): r["p_kn"]
        for r in lm.kneser_ney_bigram_query(spark, "_").collect()
    }
    want = _brute_kn(texts, lm.BIGRAM_MIN_COUNT)
    assert got.keys() == want.keys()
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=0, abs_tol=1e-12), k


def test_kneser_ney_mass_sums_below_one(spark, sf_dir):
    rows = lm.kneser_ney_bigram_query(spark, sf_dir).collect()
    mass: dict[str, float] = {}
    for r in rows:
        mass[r["token"]] = mass.get(r["token"], 0.0) + r["p_kn"]
        assert 0.0 < r["p_kn"] <= 1.0
    # emitted (observed-continuation) mass per context can reach at
    # most 1; the deficit is the backoff mass reserved for unseen
    # continuations, which must be nonnegative
    assert mass and all(m <= 1.0 + 1e-9 for m in mass.values())


def test_kneser_ney_discount_lowers_raw_mle(spark, sf_dir):
    # for every emitted bigram with a below-average-continuation next
    # token, p_kn < raw MLE; globally the discount must bite somewhere
    rows = lm.kneser_ney_bigram_query(spark, sf_dir).collect()
    below = sum(
        1 for r in rows if r["p_kn"] < r["pair_n"] / r["ctx_n"]
    )
    assert below > 0


# ---- knn_lof_outliers ----------------------------------------------------


def test_lof_flags_directional_outlier(spark, monkeypatch):
    # 7 vectors hugging direction e0 (tiny angular jitter) + one
    # orthogonal outlier, all in one IVF cell (single label).
    cluster = [[1.0, 0.01 * i, 0.0, 0.0] for i in range(7)]
    outlier = [[0.0, 0.0, 1.0, 0.0]]
    df = _emb_df(spark, cluster + outlier)
    monkeypatch.setattr(similarity.tables, "table", lambda *a: df)
    rows = {
        r["vec_id"]: r
        for r in similarity.knn_lof_outliers_query(spark, "_").collect()
    }
    assert len(rows) == 8
    lofs = {i: rows[i]["lof"] for i in rows}
    assert max(lofs, key=lofs.get) == 7  # the orthogonal point
    assert rows[7]["is_outlier"]
    # cluster members sit near density parity with their neighbors
    assert all(lofs[i] < lofs[7] for i in range(7))


def test_lof_uniform_cluster_scores_near_one(spark, sf_dir):
    rows = similarity.knn_lof_outliers_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_nbrs"] <= similarity.KNN_K
        assert r["lof"] > 0.0


def test_lof_duplicate_points_saturate_not_crash(spark, monkeypatch):
    # 4 identical vectors: all pair distances 0, sum_reach hits the
    # greatest(.,1) floor -> lrd saturates, lof stays finite
    df = _emb_df(spark, [[1.0, 0.0]] * 4)
    monkeypatch.setattr(similarity.tables, "table", lambda *a: df)
    rows = similarity.knn_lof_outliers_query(spark, "_").collect()
    assert len(rows) == 4
    for r in rows:
        assert math.isfinite(r["lof"]) and r["lof"] > 0.0


# ---- knn_label_purity ----------------------------------------------------


def test_label_purity_pure_and_mixed_classes(spark, monkeypatch):
    # two tight directional clusters; label 0 pure, label 1 pure ->
    # every neighbor shares the node's label (purity 1 per class)
    a = [[1.0, 0.001 * i, 0.0, 0.0] for i in range(4)]
    b = [[0.0, 0.0, 1.0, 0.001 * i] for i in range(4)]
    df = _emb_df(spark, a + b, labels=[0] * 4 + [1] * 4)
    monkeypatch.setattr(similarity.tables, "table", lambda *a_: df)
    rows = {r["label"]: r for r in
            similarity.knn_label_purity_query(spark, "_").collect()}
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r["n_nodes"] == 4
        assert r["n_same"] == r["n_edges"]
        assert r["purity"] == 1.0


def test_label_purity_exact_ratio_at_gate_sf(spark, sf_dir):
    rows = similarity.knn_label_purity_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["purity"] <= 1.0
        assert r["purity"] == r["n_same"] / r["n_edges"]


# ---- dp_laplace_counts ---------------------------------------------------


def test_dp_noise_is_deterministic_and_laplace_shaped(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import dq

    a = {(r["event_type"], r["day"]): r["noise_fp"]
         for r in dq.dp_laplace_counts_query(spark, sf_dir).collect()}
    b = {(r["event_type"], r["day"]): r["noise_fp"]
         for r in dq.dp_laplace_counts_query(spark, sf_dir).collect()}
    assert a == b  # seeded: a re-run releases the SAME noise
    noise = [v / 1e6 for v in a.values()]
    n = len(noise)
    assert n > 20
    mean = sum(noise) / n
    var = sum((x - mean) ** 2 for x in noise) / n
    # Laplace(0, 1): mean 0, var 2 — loose gates for a finite sample
    assert abs(mean) < 0.75
    assert 0.5 < var < 8.0
    # two-sided: both signs must occur
    assert any(x > 0 for x in noise) and any(x < 0 for x in noise)


def test_dp_noisy_n_reconstructs_from_parts(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import dq

    for r in dq.dp_laplace_counts_query(spark, sf_dir).collect():
        assert r["noisy_n"] == (r["true_n"] * 10**6 + r["noise_fp"]) / 1e6


def test_dp_noise_keyed_not_positional(spark, monkeypatch):
    # the draw is a function of (event_type, day) ONLY: permuting the
    # input rows or changing unrelated groups must not move a group's
    # noise — the property that makes the release auditable
    from pyspark.sql import Row

    from _kafka_streams_scaffold_spark.operators import dq

    import datetime
    def ev(i, et, day):
        return Row(event_id=i, ts=datetime.datetime(2024, 1, day, 12, 0, 0),
                   user_id=i, event_type=et, value=1.0, props="{}")
    base = [ev(0, "click", 1), ev(1, "click", 1), ev(2, "buy", 2)]
    extra = base + [ev(3, "scroll", 3)]
    out = {}
    for tag, rows in (("base", base), ("extra", list(reversed(extra)))):
        df = spark.createDataFrame(rows)
        monkeypatch.setattr(dq.tables, "table", lambda *a: df)
        out[tag] = {(r["event_type"], r["day"]): r["noise_fp"]
                    for r in dq.dp_laplace_counts_query(spark, "_").collect()}
    for k, v in out["base"].items():
        assert out["extra"][k] == v


# ---- mutual_information --------------------------------------------------


def test_mi_independent_and_dependent_extremes(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import stats

    def docs(rows):
        return spark.createDataFrame(
            [Row(doc_id=i, text="t", lang=l, source=s, n_chars=1)
             for i, (s, l) in enumerate(rows)]
        )

    # perfectly dependent: lang is a function of source (and vice
    # versa, two balanced classes) -> MI == H(x) == H(y), norm_mi ~ 1
    dep = docs([("a", "en")] * 8 + [("b", "de")] * 8)
    monkeypatch.setattr(stats.tables, "table", lambda *a: dep)
    r = stats.mutual_information_query(spark, "_").collect()[0]
    assert math.isclose(r["mi_nats"], math.log(2), abs_tol=2e-6)
    assert math.isclose(r["norm_mi"], 1.0, abs_tol=1e-6)

    # independent: every (source, lang) cell equally likely -> MI ~ 0
    ind = docs([(s, l) for s in ("a", "b") for l in ("en", "de")] * 4)
    monkeypatch.setattr(stats.tables, "table", lambda *a: ind)
    r = stats.mutual_information_query(spark, "_").collect()[0]
    assert abs(r["mi_nats"]) < 2e-6
    assert abs(r["norm_mi"]) < 1e-5


def test_mi_bounded_by_marginal_entropies(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import stats

    r = stats.mutual_information_query(spark, sf_dir).collect()[0]
    # the fixed-point floor can undershoot by <= 1e-6 per cell, never
    # push MI above the entropy bound by more than that
    eps = 1e-5
    assert -eps <= r["mi_nats"] <= min(r["h_source_nats"], r["h_lang_nats"]) + eps
    assert 0.0 <= r["norm_mi"] <= 1.0 + eps


# ---- ivm_join_revenue ----------------------------------------------------


def test_ivm_join_identity_equals_recompute(spark, sf_dir):
    """The operator computes V_old + bilinear delta; this recomputes
    the view directly from the new snapshots in-DataFrame and checks
    exact equality — the maintenance identity, engine-side."""
    from pyspark.sql import functions as F

    from _kafka_streams_scaffold_spark import tables
    from _kafka_streams_scaffold_spark.operators import temporal

    got = {
        r["c_nationkey"]: (r["n_pairs"], r["revenue_cents"])
        for r in temporal.ivm_join_revenue_query(spark, sf_dir).collect()
    }
    orders = tables.table(spark, sf_dir, "orders")
    cust = tables.table(spark, sf_dir, "customer")
    want = {
        r["c_nationkey"]: (r["n"], r["rev"])
        for r in (
            orders.filter(F.col("o_orderkey") % 13 != 0)
            .join(
                cust.filter(F.col("c_custkey") % 11 != 0),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias("rev"),
            )
            .collect()
        )
    }
    assert got == want


def test_ivm_join_all_three_delta_terms_fire(spark, sf_dir):
    # the churn moduli guarantee: orders deleted (k%10!=0 & k%13==0),
    # orders inserted (k%10==0 & k%13!=0), customers deleted and
    # inserted likewise — so dA x B, A x dB and dA x dB are all
    # non-empty at the gate SF (else the identity test proves less)
    from pyspark.sql import functions as F

    from _kafka_streams_scaffold_spark import tables

    orders = tables.table(spark, sf_dir, "orders")
    cust = tables.table(spark, sf_dir, "customer")
    k = F.col("o_orderkey")
    assert orders.filter((k % 10 != 0) & (k % 13 == 0)).count() > 0
    assert orders.filter((k % 10 == 0) & (k % 13 != 0)).count() > 0
    c = F.col("c_custkey")
    assert cust.filter((c % 7 != 0) & (c % 11 == 0)).count() > 0
    assert cust.filter((c % 7 == 0) & (c % 11 != 0)).count() > 0


# ---- quantized_ann_ndcg --------------------------------------------------


def test_ndcg_perfect_ranking_scores_one(spark, monkeypatch):
    # corpus where int8 quantization preserves the exact order for
    # every query: well-separated directions -> ndcg == 1 for int8
    vecs = [[float(i == j) for j in range(8)] for i in range(8)]
    # make neighbors unambiguous: add a shared component
    vecs = [[v + 0.1 for v in row] for row in vecs]
    df = _emb_df(spark, vecs)
    monkeypatch.setattr(quantize.tables, "table", lambda *a: df)
    rows = quantize.quantized_ann_ndcg_query(spark, "_").collect()
    by_tier = {}
    for r in rows:
        by_tier.setdefault(r["tier"], []).append(r)
    assert set(by_tier) == {"int8", "binary"}
    for r in by_tier["int8"]:
        assert r["ndcg"] == 1.0  # exact integer dcg_fp == idcg_fp
        assert r["dcg_fp"] == r["idcg_fp"]


def test_ndcg_bounds_and_tier_ordering(spark, sf_dir):
    rows = quantize.quantized_ann_ndcg_query(spark, sf_dir).collect()
    assert len(rows) == 2 * quantize.N_QUERIES
    mean = {}
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9
        mean.setdefault(r["tier"], []).append(r["ndcg"])
    m = {t: sum(v) / len(v) for t, v in mean.items()}
    # 8 bits/dim must not rank worse than 1 bit/dim on average
    assert m["int8"] >= m["binary"]


# ---- hll_rolling_distinct ------------------------------------------------


def test_hll_rolling_merge_equals_window_recompute(spark, sf_dir):
    """The merge = max algebra: the trailing-window estimate must
    equal an HLL built from scratch over the window's raw events.
    Verified per day by recomputing registers from the fanned-out
    event set in python."""
    import datetime
    import hashlib

    from _kafka_streams_scaffold_spark import tables
    from _kafka_streams_scaffold_spark.operators import sketches

    got = {r["day"]: r for r in
           sketches.hll_rolling_distinct_query(spark, sf_dir).collect()}
    ev = tables.table(spark, sf_dir, "events").select("ts", "user_id").collect()
    by_day: dict[datetime.date, set] = {}
    for r in ev:
        by_day.setdefault(r["ts"].date(), set()).add(r["user_id"])
    wbits = sketches._HLL_WBITS
    for day, row in got.items():
        d = datetime.date.fromisoformat(day)
        users = set()
        for back in range(sketches.HLL_ROLL_DAYS):
            users |= by_day.get(d - datetime.timedelta(days=back), set())
        assert row["n_exact"] == len(users)
        regs: dict[int, int] = {}
        for u in users:
            h = int(hashlib.md5(f"hll:{u}".encode()).hexdigest()[:15], 16)
            r_, w = h % sketches.HLL_M, h // sketches.HLL_M
            k = wbits + 1 if w == 0 else wbits - w.bit_length() + 1
            regs[r_] = max(regs.get(r_, 0), k)
        assert row["m_used"] == len(regs)
        s = sum(2 ** (wbits + 1 - k) for k in regs.values())
        s += (sketches.HLL_M - len(regs)) * 2 ** (wbits + 1)
        want = (sketches.HLL_ALPHA * sketches.HLL_M * sketches.HLL_M
                * 2 ** (wbits + 1) / s)
        assert math.isclose(row["hll_estimate"], want, rel_tol=1e-12)


def test_hll_rolling_estimate_within_bound_after_lc(spark, sf_dir):
    # same acceptance contract as hll_user_sketch: raw estimator in
    # the large range, python-side linear counting in the small range
    from _kafka_streams_scaffold_spark.operators import sketches

    for r in sketches.hll_rolling_distinct_query(spark, sf_dir).collect():
        est = r["hll_estimate"]
        if r["small_range"]:
            m = sketches.HLL_M
            est = m * math.log(m / (m - r["m_used"]))
        sigma = 1.04 / math.sqrt(sketches.HLL_M) * max(r["n_exact"], 1)
        assert abs(est - r["n_exact"]) <= 3 * sigma + 1


# ---- charset_profile -----------------------------------------------------


def test_charset_profile_counts_known_classes(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import textops

    texts = {
        "clean": "Hello World 123",
        "dirty": "x\x01\x02��Y9",
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source=s, n_chars=len(t))
         for i, (s, t) in enumerate(texts.items())]
    )
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    rows = {r["source"]: r for r in
            textops.charset_profile_query(spark, "_").collect()}
    clean, dirty = rows["clean"], rows["dirty"]
    assert clean["control_rate"] == 0.0
    assert clean["replacement_rate"] == 0.0
    assert clean["ascii_printable_rate"] == 1.0
    n = len(texts["dirty"])
    assert dirty["control_rate"] == 2 / n
    assert dirty["replacement_rate"] == 2 / n
    assert dirty["digit_rate"] == 1 / n
    assert dirty["upper_rate"] == 1 / n


def test_charset_profile_rates_bounded(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import textops

    rows = textops.charset_profile_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for c in ("ascii_printable_rate", "control_rate",
                  "replacement_rate", "digit_rate", "upper_rate"):
            assert 0.0 <= r[c] <= 1.0


# ---- bootstrap_se --------------------------------------------------------


def test_bootstrap_se_deterministic_and_calibrated(spark, sf_dir):
    from _kafka_streams_scaffold_spark import tables
    from _kafka_streams_scaffold_spark.operators import stats

    a = {r["event_type"]: r for r in
         stats.bootstrap_se_query(spark, sf_dir).collect()}
    b = {r["event_type"]: r for r in
         stats.bootstrap_se_query(spark, sf_dir).collect()}
    assert {k: v["boot_se"] for k, v in a.items()} == {
        k: v["boot_se"] for k, v in b.items()
    }  # seeded: bit-identical across runs
    ev = tables.table(spark, sf_dir, "events").select(
        "event_type", "value"
    ).collect()
    by_type: dict[str, list[float]] = {}
    for r in ev:
        if r["value"] is not None:
            by_type.setdefault(r["event_type"], []).append(r["value"])
    for et, row in a.items():
        vals = by_type[et]
        n = len(vals)
        mean = sum(vals) / n
        sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1))
        theo = sd / math.sqrt(n)
        # B=32 replicates: the bootstrap SE should bracket the
        # analytic SE well within a factor of ~2.5
        assert 0.4 * theo < row["boot_se"] < 2.5 * theo
        assert math.isclose(row["mean_value"], mean, rel_tol=1e-5)


def test_bootstrap_zero_variance_gives_zero_se(spark, monkeypatch):
    import datetime

    from _kafka_streams_scaffold_spark.operators import stats

    rows = [Row(event_id=i, ts=datetime.datetime(2024, 1, 1 + i % 3),
                user_id=i, event_type="c", value=7.0, props="{}")
            for i in range(40)]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(stats.tables, "table", lambda *a: df)
    out = stats.bootstrap_se_query(spark, "_").collect()
    assert len(out) == 1
    # every replicate's weighted mean of a constant is the constant
    assert out[0]["mean_value"] == 7.0
    assert out[0]["boot_se"] == 0.0


# ---- dsir_importance -----------------------------------------------------


def test_dsir_target_slice_scores_higher(spark, sf_dir):
    from _kafka_streams_scaffold_spark import tables
    from _kafka_streams_scaffold_spark.operators import lm

    scores = {r["doc_id"]: r for r in
              lm.dsir_importance_query(spark, sf_dir).collect()}
    langs = {r["doc_id"]: r["lang"] for r in
             tables.table(spark, sf_dir, "documents")
             .select("doc_id", "lang").collect()}
    t = [r["dsir_avg"] for d, r in scores.items() if langs[d] == "en"]
    o = [r["dsir_avg"] for d, r in scores.items() if langs[d] != "en"]
    assert t and o
    # the operator's raison d'etre: target-domain docs rank above raw
    assert sum(t) / len(t) > sum(o) / len(o)
    # log-weight identity: sum = avg * n (up to the two divisions)
    for r in scores.values():
        assert math.isclose(r["dsir_sum"], r["dsir_avg"] * r["n_feats"],
                            rel_tol=1e-9)


def test_dsir_short_docs_absent(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import lm

    rows = [Row(doc_id=1, text="single", lang="en", source="s", n_chars=6),
            Row(doc_id=2, text="two tokens here", lang="fr", source="s",
                n_chars=15)]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(lm.tables, "table", lambda *a: df)
    out = lm.dsir_importance_query(spark, "_").collect()
    assert {r["doc_id"] for r in out} == {2}
    assert out[0]["n_feats"] == 2


# ---- fs_linkage_scores ---------------------------------------------------


def test_fs_linkage_matches_python_recompute(spark, sf_dir):
    from _kafka_streams_scaffold_spark import tables
    from _kafka_streams_scaffold_spark.operators import dedup, linkage

    out = linkage.fs_linkage_scores_query(spark, sf_dir).collect()
    cand = {(r["doc_a"], r["doc_b"]) for r in
            dedup.minhash_lsh_pairs_query(spark, sf_dir).collect()}
    assert {(r["doc_a"], r["doc_b"]) for r in out} == cand

    docs = tables.table(spark, sf_dir, "documents").collect()
    n = len(docs)
    attrs = {
        r["doc_id"]: {
            "lang": r["lang"],
            "source": r["source"],
            "len_b": r["n_chars"] // linkage.LEN_BUCKET,
            "pfx": r["text"].lower()[: linkage.PFX_CHARS],
        }
        for r in docs
    }
    for r in out:
        a, b = attrs[r["doc_a"]], attrs[r["doc_b"]]
        mask, fp = 0, 0
        for name, bit, mn in linkage._FIELDS:
            import collections

            vals = [attrs[d][name] for d in attrs]
            num = sum(
                c * c for c in collections.Counter(vals).values()
            )
            agree = a[name] == b[name]
            if agree:
                mask |= bit
                fp += math.floor(1e6 * math.log(
                    (float(mn) * float(n * n))
                    / (float(linkage.M_DEN) * float(num))))
            else:
                fp += math.floor(1e6 * math.log(
                    (float(linkage.M_DEN - mn) * float(n * n))
                    / (float(linkage.M_DEN) * float(n * n - num))))
        assert r["agree_mask"] == mask
        assert math.isclose(r["fs_score"], fp / 1e6, rel_tol=1e-12)


def test_fs_high_cardinality_field_dominates(spark, sf_dir):
    """A text-prefix agreement must outweigh a language agreement:
    FS's discriminative-power weighting in one assertion."""
    from _kafka_streams_scaffold_spark.operators import linkage

    out = linkage.fs_linkage_scores_query(spark, sf_dir).collect()
    assert out, "LSH tier produced no candidate pairs at this sf"
    # every candidate pair that agrees on the prefix (bit 8) scores
    # above every pair that agrees on nothing
    with_pfx = [r["fs_score"] for r in out if r["agree_mask"] & 8]
    without = [r["fs_score"] for r in out if r["agree_mask"] == 0]
    if with_pfx and without:
        assert min(with_pfx) > max(without)


# ---- calibration_audit ---------------------------------------------------


def test_calibration_audit_matches_python_recompute(spark, sf_dir):
    import hashlib
    from collections import defaultdict

    from _kafka_streams_scaffold_spark import tables
    from _kafka_streams_scaffold_spark.operators import features

    out = {r["bucket"]: r for r in
           features.calibration_audit_query(spark, sf_dir).collect()}

    orders = tables.table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority").collect()
    cust = {r["c_custkey"]: (r["c_mktsegment"], r["c_nationkey"])
            for r in tables.table(spark, sf_dir, "customer").collect()}

    def h(okey):
        return int(hashlib.md5(f"43:{okey}".encode()).hexdigest()[:15],
                   16) % 100

    tr_n, tr_k = defaultdict(int), defaultdict(int)
    test_rows = []
    for r in orders:
        g = cust[r["o_custkey"]]
        y = int(r["o_orderpriority"] == "1-URGENT")
        if h(r["o_orderkey"]) >= features.TEST_PCT:
            tr_n[g] += 1
            tr_k[g] += y
        else:
            test_rows.append((g, y))
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, sum_pred_fp, sum_y, sq
    for g, y in test_rows:
        if g not in tr_n:
            continue
        pred_fp = (10**6 * (tr_k[g] + 1)) // (tr_n[g] + 2)
        b = (10 * (tr_k[g] + 1)) // (tr_n[g] + 2)
        a = agg[b]
        a[0] += 1
        a[1] += pred_fp
        a[2] += y
        a[3] += (pred_fp - y * 10**6) ** 2
    assert set(out) == set(agg)
    for b, (n, sp, sy, sq) in agg.items():
        r = out[b]
        assert r["n_test"] == n
        assert math.isclose(r["avg_pred"], sp / (n * 1e6), rel_tol=1e-12)
        assert math.isclose(r["actual_rate"], sy / n, rel_tol=1e-12)
        assert math.isclose(r["brier"], sq / (n * 1e12), rel_tol=1e-12)
        assert 0.0 <= r["avg_pred"] <= 1.0 and 0.0 <= r["brier"] <= 1.0


# ---- hll_distinct_rollup -------------------------------------------------


def test_hll_rollup_merge_algebra_at_every_grain(spark, sf_dir):
    """Coarse cells must equal an HLL built from scratch over their
    raw user sets — the register-monoid merge property GROUPING SETS
    relies on, verified cell by cell in python."""
    import hashlib

    from _kafka_streams_scaffold_spark import tables
    from _kafka_streams_scaffold_spark.operators import sketches

    got = {(r["event_type"], r["day"]): r for r in
           sketches.hll_distinct_rollup_query(spark, sf_dir).collect()}
    ev = tables.table(spark, sf_dir, "events").select(
        "event_type", "ts", "user_id").collect()
    cells: dict[tuple, set] = {}
    for r in ev:
        day = r["ts"].date().isoformat()
        for key in ((r["event_type"], day), (r["event_type"], "ALL"),
                    ("ALL", "ALL")):
            cells.setdefault(key, set()).add(r["user_id"])
    assert set(got) == set(cells)
    wbits = sketches._HLL_WBITS
    for key, users in cells.items():
        row = got[key]
        assert row["n_exact"] == len(users)
        regs: dict[int, int] = {}
        for u in users:
            h = int(hashlib.md5(f"hll:{u}".encode()).hexdigest()[:15], 16)
            r_, w = h % sketches.HLL_M, h // sketches.HLL_M
            k = wbits + 1 if w == 0 else wbits - w.bit_length() + 1
            regs[r_] = max(regs.get(r_, 0), k)
        assert row["m_used"] == len(regs)
        s = sum(2 ** (wbits + 1 - k) for k in regs.values())
        s += (sketches.HLL_M - len(regs)) * 2 ** (wbits + 1)
        want = (sketches.HLL_ALPHA * sketches.HLL_M * sketches.HLL_M
                * 2 ** (wbits + 1) / s)
        assert math.isclose(row["hll_estimate"], want, rel_tol=1e-12)


def test_hll_rollup_estimate_within_bound_after_lc(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import sketches

    rows = sketches.hll_distinct_rollup_query(spark, sf_dir).collect()
    grains = {( "ALL", "ALL")} & {(r["event_type"], r["day"]) for r in rows}
    assert grains, "grand-total grain missing"
    for r in rows:
        est = r["hll_estimate"]
        if r["small_range"]:
            m = sketches.HLL_M
            est = m * math.log(m / (m - r["m_used"]))
        sigma = 1.04 / math.sqrt(sketches.HLL_M) * max(r["n_exact"], 1)
        assert abs(est - r["n_exact"]) <= 3 * sigma + 1


# ---- basket_triples --------------------------------------------------------


def test_basket_triples_known_composition(spark, monkeypatch):
    import datetime

    from _kafka_streams_scaffold_spark.operators import basket

    rows = []
    baskets = {1: [10, 20, 30], 2: [10, 20, 30], 3: [10, 20], 4: [40, 50]}
    for ok, parts in baskets.items():
        for i, p in enumerate(parts):
            rows.append(Row(l_orderkey=ok, l_partkey=p, l_suppkey=1,
                            l_linenumber=i, l_quantity=1.0,
                            l_extendedprice=1.0, l_discount=0.0,
                            l_tax=0.0, l_returnflag="N", l_linestatus="O",
                            l_shipdate=datetime.datetime(2024, 1, 1)))
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(basket.tables, "table", lambda *a: df)
    out = basket.basket_triples_query(spark, "_").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["part_a"], r["part_b"], r["part_c"]) == (10, 20, 30)
    assert (r["n_all"], r["n_a"], r["n_b"], r["n_c"], r["n_orders"]) == (
        2, 3, 3, 2, 4)
    assert math.isclose(r["lift3"], 2 * 16 / (3 * 3 * 2), rel_tol=1e-12)


def test_basket_triples_prune_blocks_infrequent_subpair(spark, monkeypatch):
    """(a,b,c) appears twice but the (b,c) sub-pair only ever appears
    inside those same two orders minus one — engineer (a,c) frequent,
    (a,b) frequent, (b,c) support 1 -> the triple must NOT be emitted
    even though the triple's own support would pass the floor with a
    naive count. (Impossible by anti-monotonicity for real data — the
    guard proves the prune is part of the SEMANTICS, not an
    optimization shortcut.)"""
    import datetime

    from _kafka_streams_scaffold_spark.operators import basket

    # triple support would be 2 only if (b,c) support >= 2; instead
    # make each sub-pair's support: ab=2, ac=2, bc=1 -> no triple can
    # have support 2, and the one order containing all three is below
    # the floor. Emission must be empty.
    baskets = {1: [1, 2, 3], 2: [1, 2], 3: [1, 3]}
    rows = [Row(l_orderkey=ok, l_partkey=p, l_suppkey=1, l_linenumber=i,
                l_quantity=1.0, l_extendedprice=1.0, l_discount=0.0,
                l_tax=0.0, l_returnflag="N", l_linestatus="O",
                l_shipdate=datetime.datetime(2024, 1, 1))
            for ok, parts in baskets.items() for i, p in enumerate(parts)]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(basket.tables, "table", lambda *a: df)
    assert basket.basket_triples_query(spark, "_").count() == 0


# ---- zipf_fit --------------------------------------------------------------


def test_zipf_fit_matches_python_ols(spark, sf_dir):
    from collections import Counter

    from _kafka_streams_scaffold_spark import tables
    from _kafka_streams_scaffold_spark.operators import lexstats

    r = lexstats.zipf_fit_query(spark, sf_dir).collect()[0]
    docs = tables.table(spark, sf_dir, "documents").select("text").collect()
    counts = Counter(
        w for row in docs for w in re.split(r"\W+", row["text"].lower()) if w
    )
    head = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    head = head[: lexstats.ZIPF_TOP]
    pts = [
        (math.floor(1e6 * math.log(i + 1)), math.floor(1e6 * math.log(c)))
        for i, (_, c) in enumerate(head)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    cov, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert r["n_types"] == len(counts) and r["n_fit"] == n
    assert math.isclose(r["slope"], cov / vx, rel_tol=1e-9)
    assert math.isclose(
        r["intercept"], (sy - (cov / vx) * sx) / (n * 1e6), rel_tol=1e-9
    )
    assert math.isclose(r["r2"], cov * cov / (vx * vy), rel_tol=1e-9)
    # a frequency-ranked head always slopes downward
    assert r["slope"] < 0 and 0.0 <= r["r2"] <= 1.0


def test_zipf_fit_single_type_undefined(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import lexstats

    df = spark.createDataFrame(
        [Row(doc_id=1, text="word word word", lang="en", source="s",
             n_chars=14)]
    )
    monkeypatch.setattr(lexstats.tables, "table", lambda *a: df)
    r = lexstats.zipf_fit_query(spark, "_").collect()[0]
    # one point: variance 0 -> slope/r2 undefined, reported as NULL
    assert r["n_fit"] == 1 and r["slope"] is None and r["r2"] is None


# ---- nb_lang_confusion -----------------------------------------------------


def test_nb_learns_separable_vocabularies(spark, monkeypatch):
    """Engineered corpus with disjoint per-language vocabularies: the
    classifier must put every held-out doc on the diagonal."""
    from _kafka_streams_scaffold_spark.operators import nb

    vocab = {"en": ["dog", "cat", "house"], "fr": ["chien", "chat",
                                                   "maison"],
             "de": ["hund", "katze", "haus"]}
    rows = []
    i = 0
    for lang, words in vocab.items():
        for _ in range(40):  # enough docs that both splits see each lang
            text = " ".join(words[i % 3] for _ in range(6))
            rows.append(Row(doc_id=i, text=text, lang=lang, source="s",
                            n_chars=len(text)))
            i += 1
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(nb.tables, "table", lambda *a: df)
    out = nb.nb_lang_confusion_query(spark, "_").collect()
    assert out, "no test-split docs at this seed"
    for r in out:
        assert r["true_lang"] == r["pred_lang"], out
    assert sum(r["n_docs"] for r in out) > 0


def test_nb_uninformative_features_fall_back_to_prior(spark, monkeypatch):
    """One shared vocabulary across languages with a skewed prior: the
    argmax must go to the majority class for every held-out doc (the
    likelihoods cancel; only the prior term differs)."""
    from _kafka_streams_scaffold_spark.operators import nb

    rows = []
    for i in range(60):
        lang = "en" if i % 3 else "fr"  # 2/3 en, 1/3 fr
        rows.append(Row(doc_id=i, text="same words everywhere",
                        lang=lang, source="s", n_chars=20))
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(nb.tables, "table", lambda *a: df)
    out = nb.nb_lang_confusion_query(spark, "_").collect()
    assert out
    # not exactly prior-only (per-lang token totals shift the smoothed
    # likelihoods slightly) but the MAJORITY class must win every doc
    # here: en has both the larger prior and the larger token mass
    assert {r["pred_lang"] for r in out} == {"en"}


# ---- pii_redact -------------------------------------------------------------


def test_pii_redact_known_spans(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import textops

    rows = [
        Row(doc_id=1,
            text="mail me at a.b+c@example.org or visit "
                 "https://x.io/p?id=1234567 card 1234567890",
            lang="en", source="s", n_chars=80),
        Row(doc_id=2, text="nothing sensitive here", lang="en",
            source="s", n_chars=22),
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    out = {r["doc_id"]: r for r in
           textops.pii_redact_query(spark, "_").collect()}
    r1 = out[1]
    # 4 = email + url + TWO digit runs on the ORIGINAL text (the one
    # inside the URL counts in the scan even though the redaction
    # chain swallows it into <URL>) — scan-vs-transform overlap is
    # part of the documented contract
    assert r1["n_redacted"] == 4
    assert "<EMAIL>" in r1["redacted"] and "<URL>" in r1["redacted"]
    assert "<NUM>" in r1["redacted"]
    assert "example.org" not in r1["redacted"]
    assert "1234567890" not in r1["redacted"]
    # the URL's embedded digits vanish inside <URL>, never as a
    # nested <NUM> (fixed application order)
    assert "<URL>" in r1["redacted"] and "<URL" in r1["redacted"]
    assert r1["redacted"].count("<NUM>") == 1
    r2 = out[2]
    assert r2["n_redacted"] == 0 and r2["redacted"] == rows[1].text


# ---- km_user_survival -------------------------------------------------------


def test_km_matches_textbook_estimator(spark, monkeypatch):
    """Hand-built cohort with known deaths and censoring: the
    log-survival curve must equal the textbook KM product computed in
    python with the same fixed-point rule."""
    import datetime

    from _kafka_streams_scaffold_spark.operators import stats

    base = datetime.datetime(2024, 1, 1)

    def ev(eid, uid, day):
        return Row(event_id=eid, ts=base + datetime.timedelta(days=day),
                   user_id=uid, event_type="view", value=1.0, props="{}")

    rows = []
    eid = 0
    # users 1-3: lifetime 2 days, last event day 2 (corpus ends day 30
    # -> dead). user 4: lifetime 5 (dead). users 5-6: last event day
    # 29 -> censored, lifetimes 29 and 10.
    for uid, (f, l) in {1: (0, 2), 2: (0, 2), 3: (0, 2), 4: (0, 5),
                        5: (0, 29), 6: (19, 29)}.items():
        rows += [ev(eid, uid, f), ev(eid + 1, uid, l)]
        eid += 2
    rows.append(ev(eid, 7, 30))  # pins corpus end; lifetime 0, censored
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(stats.tables, "table", lambda *a: df)
    got = {r["t_days"]: r for r in
           stats.km_user_survival_query(spark, "_").collect()}

    # python model: lifetimes {0:c, 2:d,d,d, 5:d, 10:c, 29:c}
    lifetimes = [(0, 0), (2, 1), (2, 1), (2, 1), (5, 1), (10, 0),
                 (29, 0)]
    from collections import defaultdict
    per_t = defaultdict(lambda: [0, 0])  # deaths, censored
    for t, dead in lifetimes:
        if dead:
            per_t[t][0] += 1
        else:
            per_t[t][1] += 1
    n = len(lifetimes)
    seen = 0
    cum = 0
    want = {}
    for t in sorted(per_t):
        d, c = per_t[t]
        n_risk = n - seen
        seen += d + c
        if n_risk > d:
            if d > 0:
                cum += math.floor(1e6 * math.log((n_risk - d) / n_risk))
            want[t] = (n_risk, d, c, cum / 1e6)
    assert set(got) == set(want)
    for t, (n_risk, d, c, ls) in want.items():
        r = got[t]
        assert (r["n_risk"], r["n_deaths"], r["n_censored"]) == (n_risk,
                                                                 d, c)
        assert math.isclose(r["log_survival"], ls, rel_tol=0, abs_tol=0.0)
        assert r["log_survival"] <= 0.0  # survival never exceeds 1


# ---- zone_map_skip_audit ----------------------------------------------------


def test_zone_map_skip_ordering_and_self_check(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import layout

    rows = {r["layout"]: r for r in
            layout.zone_map_skip_audit_query(spark, sf_dir).collect()}
    assert set(rows) == {"natural", "custkey_sort", "zorder"}
    # same predicate, same data: identical matching mass everywhere
    match = {r["rows_matching"] for r in rows.values()}
    assert len(match) == 1
    nat, ck, zo = (rows["natural"], rows["custkey_sort"], rows["zorder"])
    # every scanned set must cover the matches
    for r in rows.values():
        assert r["rows_scanned"] >= r["rows_matching"]
        assert r["buckets_scanned"] <= r["n_buckets"]
    # the layout story: insertion order prunes nothing on a value
    # predicate; a single-column sort prunes on one dimension; the
    # interleave prunes on both
    assert nat["rows_scanned"] > ck["rows_scanned"] > zo["rows_scanned"]
    assert nat["buckets_scanned"] == nat["n_buckets"]


# ---- source_ablation --------------------------------------------------------


def test_source_ablation_matches_python_complement_model(spark, monkeypatch):
    from collections import Counter

    from _kafka_streams_scaffold_spark.operators import lm

    corp = {  # source -> docs
        "a": ["x x y", "x z"],
        "b": ["y y y z", "z z"],
        "c": ["w w w w"],  # w is exclusive to c
    }
    rows, i = [], 0
    for src, docs_ in corp.items():
        for t in docs_:
            rows.append(Row(doc_id=i, text=t, lang="en", source=src,
                            n_chars=len(t)))
            i += 1
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(lm.tables, "table", lambda *a: df)
    got = {r["source"]: r for r in
           lm.source_ablation_query(spark, "_").collect()}

    toks_by_src = {
        s: Counter(w for t in ds for w in t.split()) for s, ds in corp.items()
    }
    c_w = Counter()
    for c in toks_by_src.values():
        c_w.update(c)
    t_all = sum(c_w.values())
    for s, c_s in toks_by_src.items():
        t_s = sum(c_s.values())
        num = 0
        cov = 0
        for w, cw in c_w.items():
            csw = c_s.get(w, 0)
            if csw > 0:
                cov += cw
                if cw > csw:
                    num += (cw - csw) * math.floor(1e6 * math.log(
                        (float(cw - csw) * float(t_all))
                        / (float(cw) * float(t_all - t_s))))
        # tokens the source lacks: closed-form complement term
        num += (t_all - cov) * math.floor(
            1e6 * math.log(t_all / (t_all - t_s)))
        want_kl = num / ((t_all - t_s) * 1e6)
        r = got[s]
        assert math.isclose(r["token_share"], t_s / t_all, rel_tol=1e-12)
        assert math.isclose(r["kl_drop_vs_full"], want_kl, rel_tol=0,
                            abs_tol=0.0)
    # c owns all the 'w' mass: removing it shifts the corpus most
    assert got["c"]["kl_drop_vs_full"] == max(
        r["kl_drop_vs_full"] for r in got.values()
    )


# ---- rendezvous_reshard_audit -----------------------------------------------


def test_hrw_movement_is_exactly_the_new_shards_wins(spark, sf_dir):
    """The HRW minimal-movement theorem, verified per doc in python:
    a doc moves iff the ADDED shard wins its rendezvous; nothing ever
    moves between surviving shards."""
    import hashlib

    from _kafka_streams_scaffold_spark import tables
    from _kafka_streams_scaffold_spark.operators import layout

    r = layout.rendezvous_reshard_audit_query(spark, sf_dir).collect()[0]
    docs = [row["doc_id"] for row in
            tables.table(spark, sf_dir, "documents")
            .select("doc_id").collect()]

    def score(doc_id, s):
        h = int(hashlib.md5(f"hrw|{doc_id}|{s}".encode()).hexdigest()[:13],
                16)
        return h

    moved = 0
    for d in docs:
        old_winner = max(range(layout.HRW_SHARDS),
                         key=lambda s: (score(d, s), s))
        new_winner = max(range(layout.HRW_GROWN),
                         key=lambda s: (score(d, s), s))
        if new_winner != old_winner:
            # minimal-movement: the only possible new owner is the
            # added shard
            assert new_winner == layout.HRW_SHARDS
            moved += 1
    assert r["n_docs"] == len(docs)
    assert r["n_moved"] == moved
    # realized movement hovers near the theoretical 1/(N+1)
    assert r["moved_share"] < 3.0 / layout.HRW_GROWN
    assert r["max_shard_load"] >= r["min_shard_load"] >= 0


# ---- top_session_paths ------------------------------------------------------


def test_session_paths_known_journeys(spark, monkeypatch):
    import datetime

    from _kafka_streams_scaffold_spark.operators import analytics

    base = datetime.datetime(2024, 1, 1)

    def ev(eid, uid, minute, et):
        return Row(event_id=eid, ts=base + datetime.timedelta(minutes=minute),
                   user_id=uid, event_type=et, value=1.0, props="{}")

    rows = [
        # user 1, session 1: view > click > purchase
        ev(1, 1, 0, "view"), ev(2, 1, 5, "click"), ev(3, 1, 10, "purchase"),
        # user 1, session 2 (>30 min gap): view > click > purchase again
        ev(4, 1, 60, "view"), ev(5, 1, 62, "click"), ev(6, 1, 64, "purchase"),
        # user 2: same journey once
        ev(7, 2, 0, "view"), ev(8, 2, 1, "click"), ev(9, 2, 2, "purchase"),
        # user 3: a long session -> only the first PATH_LEN events count
        *[ev(10 + i, 3, i, "view") for i in range(analytics.PATH_LEN + 3)],
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(analytics.tables, "table", lambda *a: df)
    got = {r["path"]: r for r in
           analytics.top_session_paths_query(spark, "_").collect()}
    assert got["view>click>purchase"]["n_sessions"] == 3
    assert got["view>click>purchase"]["n_users"] == 2
    long_path = ">".join(["view"] * analytics.PATH_LEN)
    assert got[long_path]["n_sessions"] == 1  # truncated at PATH_LEN
    assert len(got) == 2


# ---- batch_mix_audit --------------------------------------------------------


def test_batch_mix_full_batches_hold_blend_entropy(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import sampling

    rows = sampling.batch_mix_audit_query(spark, sf_dir).collect()
    assert rows
    full = [r for r in rows if r["n_docs"] == sampling.BATCH_DOCS]
    assert full, "no full batch at this sf"
    for r in full:
        # round-robin interleave of a 20-source blend: every full
        # batch must hold a well-mixed composition (entropy within
        # ~10% of the uniform ceiling for its source count)
        ceiling = math.log(r["n_sources"])
        assert r["mix_entropy"] > 0.9 * ceiling
        assert r["mix_entropy"] <= ceiling + 1e-9
    # entropy is in nats of exact-integer fixed point: recompute one
    # batch by hand from the interleave order
    order = {r2["doc_id"]: (r2["global_pos"], r2["source"]) for r2 in
             sampling.epoch_interleave_query(spark, sf_dir).collect()}
    from collections import Counter
    b0 = Counter(src for pos, src in order.values()
                 if (pos - 1) // sampling.BATCH_DOCS == 0)
    n_b = sum(b0.values())
    want = sum(c * math.floor(1e6 * math.log(n_b / c))
               for c in b0.values()) / (n_b * 1e6)
    got0 = next(r for r in rows if r["batch"] == 0)
    assert math.isclose(got0["mix_entropy"], want, rel_tol=0, abs_tol=0.0)


# ---- fd_audit ---------------------------------------------------------------


def test_fd_audit_engineered_violation(spark, monkeypatch):
    """A hand-built frame where one dependency holds and its reverse
    fails, with the violating lhs count pinned exactly."""
    import datetime

    from _kafka_streams_scaffold_spark.operators import dq

    orders = spark.createDataFrame(
        [Row(o_orderkey=i, o_custkey=i % 3,
             o_orderstatus="O" if i % 2 else "F",
             o_totalprice=1.0, o_orderdate=datetime.datetime(2024, 1, 1),
             o_orderpriority=f"p{i % 4}")
         for i in range(12)]
    )
    cust = spark.createDataFrame(
        [Row(c_custkey=c, c_name=f"c{c}", c_nationkey=c,  # key -> nation
             c_acctbal=0.0, c_mktsegment="SEG")  # one segment, 3 nations
         for c in range(3)]
    )
    real = dq.tables.table

    def fake(spark_, sf, name):
        return {"orders": orders, "customer": cust}[name]

    monkeypatch.setattr(dq.tables, "table", fake)
    rows = {(r["lhs"], r["rhs"]): r for r in
            dq.fd_audit_query(spark, "_").collect()}
    # custkey -> segment holds (every custkey maps to the one segment)
    assert rows[("o_custkey", "c_mktsegment")]["holds"]
    # segment -> nation fails: the single segment maps to 3 nations
    seg = rows[("c_mktsegment", "c_nationkey")]
    assert not seg["holds"] and seg["n_violating"] == 1
    assert seg["n_lhs_values"] == 1
    # orderkey is a key: determines priority trivially
    assert rows[("o_orderkey", "o_orderpriority")]["holds"]


# ---- detector_kappa ---------------------------------------------------------


def test_kappa_perfect_agreement_on_exact_twins(spark, monkeypatch):
    """Identical docs are caught by BOTH detectors; everything else is
    clean for both -> po = 1, kappa = 1 exactly."""
    from _kafka_streams_scaffold_spark.operators import dedup

    twin = "the quick brown fox jumps over the lazy dog again and again"
    uniq = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet colors rainbow sky",
    ]
    rows = [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
            for i, t in enumerate([twin, twin] + uniq)]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(dedup.tables, "table", lambda *a: df)
    r = dedup.detector_kappa_query(spark, "_").collect()[0]
    assert r["flagged_minhash"] == r["flagged_simhash"] == 2
    assert r["flagged_both"] == 2
    assert r["observed_agreement"] == 1.0
    assert math.isclose(r["kappa"], 1.0, rel_tol=1e-12)


def test_kappa_bounds_on_corpus(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import dedup

    r = dedup.detector_kappa_query(spark, sf_dir).collect()[0]
    assert 0.0 <= r["observed_agreement"] <= 1.0
    assert 0.0 <= r["expected_agreement"] <= 1.0
    if r["kappa"] is not None:
        assert -1.0 <= r["kappa"] <= 1.0
    assert r["flagged_both"] <= min(r["flagged_minhash"],
                                    r["flagged_simhash"])


# ---- ht_estimate_audit ------------------------------------------------------


def test_ht_estimator_close_and_exactly_recomputable(spark, sf_dir):
    from _kafka_streams_scaffold_spark import tables
    from _kafka_streams_scaffold_spark.operators import sampling

    r = sampling.ht_estimate_audit_query(spark, sf_dir).collect()[0]
    # character-weighted sampling of a token total whose per-doc
    # token/char ratio is ~constant: the HT estimate should land
    # within a few percent of truth at K=100
    assert r["rel_err"] < 0.05
    # python recompute on the same sample (exact fixed-point rule)
    sample = {row["doc_id"]: row["multiplicity"] for row in
              sampling.systematic_weighted_sample_query(
                  spark, sf_dir).collect()}
    docs = {row["doc_id"]: (row["n_chars"], len(
        [w for w in re.split(r"\W+", row["text"].lower()) if w]))
        for row in tables.table(spark, sf_dir, "documents").collect()}
    s = sum(m * math.floor(1e6 * docs[d][1] / docs[d][0])
            for d, m in sample.items())
    tw = sum(c for c, _ in docs.values())
    want = s * tw / (sampling.SYS_SAMPLE_K * 1e6)
    assert math.isclose(r["ht_estimate"], want, rel_tol=1e-12)
    assert r["true_total_tokens"] == sum(t for _, t in docs.values())
