"""Round-4 breadth additions: referential integrity, seasonal
anomalies, basket lift, ANN rank fusion, Z-order layout, vocabulary
growth, bounded EWMA."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark.operators import (
    basket,
    dq,
    layout,
    similarity,
    stats,
    textops,
)


def test_referential_integrity_all_edges_clean(spark, sf_dir):
    rows = {
        r["relationship"]: r
        for r in dq.referential_integrity_query(spark, sf_dir).collect()
    }
    assert set(rows) == {e[0] for e in dq._FK_EDGES}
    for name, r in rows.items():
        assert r["n_orphans"] == 0, f"{name} has orphans in clean testdata"
        assert 0 < r["n_distinct_fk"] <= r["n_rows"]


def test_referential_integrity_detects_orphans(spark, monkeypatch):
    """Drop half the orders and the lineitem->orders edge must report
    exactly the rows pointing at removed keys."""
    from _kafka_streams_scaffold_spark import tables

    real = tables.table

    def patched(sp, sf, name):
        df = real(sp, sf, name)
        if name == "orders":
            return df.filter(F.col("o_orderkey") % 2 == 0)
        return df

    monkeypatch.setattr(dq.tables, "table", patched)
    rows = {
        r["relationship"]: r
        for r in dq.referential_integrity_query(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    li = real(spark, "/root/testdata/sf0.001", "lineitem")
    expect = li.filter(F.col("l_orderkey") % 2 != 0).count()
    assert rows["lineitem.orderkey->orders"]["n_orphans"] == expect > 0


def test_seasonal_anomaly_flag_matches_python(spark, sf_dir):
    rows = stats.seasonal_anomalies_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n, nd, s, ss = r["n_events"], r["n_days"], r["sum_dow"], r["sumsq_dow"]
        lhs = (nd * n - s) ** 2
        rhs = stats.SEASONAL_SIGMA_SQ * (nd * ss - s * s)
        assert r["is_anomaly"] == (lhs > rhs)


def test_seasonal_anomaly_fires_on_injected_spike(spark, monkeypatch):
    """15 weeks of flat days + one 10x day -> exactly that day flags.
    (The week count matters: with n same-weekday samples the max
    possible |z| of one outlier is (n-1)/sqrt(n), so a 3-sigma screen
    mathematically cannot fire until n >= 11 — by design it stays
    quiet on short histories.)"""
    t0 = datetime.datetime(2024, 1, 1)  # a Monday
    rows = []
    eid = 0
    for d in range(105):
        n = 1000 if d == 70 else 100  # day 70 is also a Monday
        for i in range(n):
            eid += 1
            rows.append(
                Row(
                    event_id=eid,
                    user_id=1,
                    event_type="click",
                    value=1.0,
                    ts=t0 + datetime.timedelta(days=d, seconds=i),
                )
            )
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(stats.tables, "table", lambda *a: df)
    out = {
        (r["day"], r["is_anomaly"])
        for r in stats.seasonal_anomalies_query(spark, "_").collect()
    }
    spike = datetime.date(2024, 1, 1) + datetime.timedelta(days=70)
    assert (spike, True) in out
    assert sum(1 for d, a in out if a) == 1


def test_basket_pairs_lift_and_support(spark, sf_dir):
    rows = basket.basket_pairs_query(spark, sf_dir).collect()
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["n_both"] >= basket.MIN_PAIR_SUPPORT
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        expect = r["n_both"] * r["n_orders"] / (r["n_a"] * r["n_b"])
        assert abs(r["lift"] - expect) < 1e-12


def test_basket_pairs_hand_case(spark, monkeypatch):
    """3 orders: {1,2} {1,2} {1,3} with MIN support 2 -> only (1,2),
    lift = 2*3/(3*2) = 1."""
    li = spark.createDataFrame(
        [
            Row(l_orderkey=10, l_partkey=1),
            Row(l_orderkey=10, l_partkey=2),
            Row(l_orderkey=20, l_partkey=1),
            Row(l_orderkey=20, l_partkey=2),
            Row(l_orderkey=30, l_partkey=1),
            Row(l_orderkey=30, l_partkey=3),
        ]
    )
    monkeypatch.setattr(basket.tables, "table", lambda *a: li)
    monkeypatch.setattr(basket, "MIN_PAIR_SUPPORT", 2)
    rows = basket.basket_pairs_query(spark, "_").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["part_a"], r["part_b"], r["n_both"]) == (1, 2, 2)
    assert r["lift"] == 2 * 3 / (3 * 2)


def test_ann_rank_fusion_consensus_on_top(spark, sf_dir):
    rows = similarity.ann_rank_fusion_query(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert len(by_q) == similarity.N_QUERIES
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["fused_rank"])
        assert [r["fused_rank"] for r in rs] == list(range(1, len(rs) + 1))
        # scores non-increasing along fused rank
        scores = [r["rrf_scaled"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(1 <= r["n_tiers"] <= 3 for r in rs)
        # a neighbor returned by all three tiers at rank 1 must rank
        # first overall when present
        top = rs[0]
        assert top["n_tiers"] >= 1


def test_zorder_buckets_localize_both_dims(spark, sf_dir):
    rows = layout.zorder_layout_query(spark, sf_dir).collect()
    assert 1 < len(rows) <= (1 << layout.Z_PREFIX_BITS)
    ck_span_total = max(r["custkey_hi"] for r in rows) - min(
        r["custkey_lo"] for r in rows
    )
    dy_span_total = max(r["day_hi"] for r in rows) - min(
        r["day_lo"] for r in rows
    )
    n = len(rows)
    mean_ck = sum(r["custkey_hi"] - r["custkey_lo"] for r in rows) / n
    mean_dy = sum(r["day_hi"] - r["day_lo"] for r in rows) / n
    # the point of Z-order: BOTH dimensions' per-bucket spans shrink
    # (a single-column sort would leave the other dimension's span
    # at ~full range in every bucket)
    assert mean_ck < 0.8 * ck_span_total
    assert mean_dy < 0.8 * dy_span_total


def test_vocab_growth_is_cumulative_and_complete(spark, sf_dir):
    from _kafka_streams_scaffold_spark import tables

    rows = sorted(
        textops.vocab_growth_query(spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    docs = tables.table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    run = 0
    for r in rows:
        run += r["new_terms"]
        assert r["cum_terms"] == run
    total_vocab = (
        docs.select(F.explode(textops.tokens_expr()).alias("t"))
        .agg(F.countDistinct("t"))
        .collect()[0][0]
    )
    assert rows[-1]["cum_terms"] == total_vocab
    # Heaps law: later buckets contribute fewer new terms than the first
    assert rows[-1]["new_terms"] < rows[0]["new_terms"]


def test_ewma_matches_python_fold(spark, sf_dir):
    rows = stats.ewma_user_value_query(spark, sf_dir).collect()
    from _kafka_streams_scaffold_spark import tables

    ev = sorted(
        tables.table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    hist: dict[int, list[float]] = {}
    expect = {}
    for r in ev:
        h = hist.setdefault(r["user_id"], [])
        h.append(float(r["value"]))
        frame = h[-stats.EWMA_WINDOW:]
        acc = 0.0
        for v in frame:
            acc = acc / 2.0 + v
        expect[(r["user_id"], r["event_id"])] = (
            acc / (2.0 - 2.0 ** (1 - len(frame))),
            len(frame),
        )
    assert len(rows) == len(expect)
    for r in rows:
        e, n = expect[(r["user_id"], r["event_id"])]
        assert r["n_window"] == n
        assert r["ewma"] == e  # bit-exact by construction


def test_ab_test_cells_and_chi2(spark, sf_dir):
    rows = sorted(
        stats.ab_test_chi2_query(spark, sf_dir).collect(),
        key=lambda r: r["variant"],
    )
    assert [r["variant"] for r in rows] == [0, 1]
    a = rows[0]["n_converted"]
    b = rows[0]["n_users"] - a
    c = rows[1]["n_converted"]
    d = rows[1]["n_users"] - c
    assert min(rows[0]["n_users"], rows[1]["n_users"]) > 0
    denom = (a + b) * (c + d) * (a + c) * (b + d)
    if denom:
        expect = (
            (a + b + c + d) * (a * d - b * c) ** 2 / denom
        )
        for r in rows:
            assert abs(r["chi2"] - expect) < 1e-9
    else:
        assert all(r["chi2"] is None for r in rows)
    # both variants must see a non-degenerate conversion rate on the
    # synthetic data (the threshold sits at the median)
    assert 0 < rows[0]["conv_rate"] < 1
    assert 0 < rows[1]["conv_rate"] < 1


def test_last_touch_attribution_conserves_revenue(spark, sf_dir):
    from _kafka_streams_scaffold_spark import tables
    from _kafka_streams_scaffold_spark.operators import analytics as an_mod

    rows = an_mod.last_touch_attribution_query(spark, sf_dir).collect()
    total = sum(r["revenue_cents"] for r in rows)
    ev = tables.table(spark, sf_dir, "events")
    expect = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.floor(F.col("value") * 100).cast("bigint")))
        .collect()[0][0]
    )
    assert total == expect, "attribution must conserve purchase revenue"
    assert sum(r["n_purchases"] for r in rows) == ev.filter(
        F.col("event_type") == "purchase"
    ).count()
    assert all(r["touch_type"] != "purchase" for r in rows)


def test_pit_dimension_join_conserves_purchases(spark, sf_dir):
    from _kafka_streams_scaffold_spark import tables
    from _kafka_streams_scaffold_spark.operators import temporal

    rows = temporal.pit_dimension_join_query(spark, sf_dir).collect()
    ev = tables.table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    assert sum(r["n_purchases"] for r in rows) == purchases.count()
    assert sum(r["revenue_cents"] for r in rows) == (
        purchases.agg(
            F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        ).collect()[0][0]
    )
    states = {r["state_at_purchase"] for r in rows}
    assert "purchase" not in states, "dimension must exclude purchases"
    assert len(states) > 1, "PIT join should spread over activity states"


def test_pit_join_no_future_leakage(spark, monkeypatch):
    """A purchase between two state changes must attribute to the
    EARLIER state — attributing to the later one is exactly the
    future-information leak the operator prevents."""
    from _kafka_streams_scaffold_spark.operators import temporal

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, et, minutes):
        return Row(
            event_id=i,
            user_id=1,
            event_type=et,
            value=10.0,
            ts=t0 + datetime.timedelta(minutes=minutes),
        )

    df = spark.createDataFrame(
        [
            ev(1, "click", 0),
            ev(2, "purchase", 5),  # during 'click' state
            ev(3, "signup", 10),
            ev(4, "purchase", 15),  # during 'signup' state
        ]
    )
    monkeypatch.setattr(temporal.tables, "table", lambda *a: df)
    rows = {
        r["state_at_purchase"]: r["n_purchases"]
        for r in temporal.pit_dimension_join_query(spark, "_").collect()
    }
    assert rows == {"click": 1, "signup": 1}


def test_cms_never_undercounts_and_is_tight(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import sketches

    from _kafka_streams_scaffold_spark import tables as _t

    n_users = (
        _t.table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    rows = sketches.cms_user_counts_query(spark, sf_dir).collect()
    assert len(rows) == min(sketches.CMS_TOP, n_users)
    for r in rows:
        assert r["never_undercounts"] is True
        assert r["cms_estimate"] >= r["true_n"]
        assert r["overcount"] == r["cms_estimate"] - r["true_n"]
    # sanity on the error bound: expected overcount ~ N/width per row;
    # with min over 4 rows it should stay well under 10x that
    from _kafka_streams_scaffold_spark import tables

    n = tables.table(spark, sf_dir, "events").count()
    bound = 10 * n / sketches.CMS_WIDTH
    assert all(r["overcount"] <= bound for r in rows)


def test_bloom_guarantees(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import sketches

    r = sketches.bloom_filter_audit_query(spark, sf_dir).collect()[0]
    assert r["no_false_negatives"] is True
    assert 0 < r["bits_set"] <= sketches.BLOOM_BITS
    assert 0 <= r["n_false_positives"] <= r["n_probes"] - r["n_members"]
    # FPR sanity: (bits_set/m)^k bound with generous slack
    p = (r["bits_set"] / sketches.BLOOM_BITS) ** sketches.BLOOM_K
    non_members = r["n_probes"] - r["n_members"]
    if non_members:
        fpr = r["n_false_positives"] / non_members
        assert fpr <= 5 * p + 0.01


def test_k_anonymity_buckets(spark, sf_dir):
    from _kafka_streams_scaffold_spark import tables

    rows = dq.k_anonymity_audit_query(spark, sf_dir).collect()
    cust = tables.table(spark, sf_dir, "customer")
    assert sum(r["n_rows"] for r in rows) == cust.count()
    n_classes = (
        cust.select(*dq._QI_COLS).distinct().count()
    )
    assert sum(r["n_classes"] for r in rows) == n_classes
    for r in rows:
        # at_risk <=> bucket's smallest class below K; bucket floor
        # 2^b can only be at risk when 2^b < K
        if (1 << r["class_size_bucket"]) >= dq.KANON_K:
            assert r["at_risk"] is False


def test_hll_sketch_accuracy_with_lc_correction(spark, sf_dir):
    """The hand-rolled HLL's accuracy contract: in the large range the
    raw estimator sits within 3 sigma; in the small range (n < 2.5m)
    apply the standard linear-counting correction from the occupied-
    register count (Python-side ln — banned from hashed outputs, fine
    here) and check THAT against the exact count."""
    import math

    from _kafka_streams_scaffold_spark.operators import sketches

    rows = sketches.hll_user_sketch_query(spark, sf_dir).collect()
    assert rows
    m = sketches.HLL_M
    for r in rows:
        if r["small_range"]:
            v_empty = m - r["m_used"]
            assert v_empty > 0, "small range must leave empty registers"
            lc = m * math.log(m / v_empty)
            # LC std err ~ sqrt(m)/n scale; 15% covers every sf here
            assert abs(lc - r["n_exact"]) <= max(
                3.0, 0.15 * r["n_exact"]
            ), (r["event_type"], lc, r["n_exact"])
        else:
            assert (
                abs(r["hll_estimate"] - r["n_exact"])
                <= sketches.HLL_TOL * r["n_exact"]
            )


def test_hll_sketch_large_range(spark):
    """Drive the raw estimator in its valid regime (n >> m) with a
    synthetic 10k-key frame and check the 3-sigma bound directly."""
    from _kafka_streams_scaffold_spark.operators import sketches

    df = spark.range(10_000).selectExpr(
        "'x' as event_type", "id as user_id"
    )
    # build the sketch pipeline directly over the synthetic frame
    from pyspark.sql import functions as FF

    reg, rank = sketches._hll_registers("spark")
    h60 = (
        "cast(conv(substring(md5(concat('hll:', cast(user_id as string))),"
        " 1, 15), 16, 10) as bigint)"
    )
    regs = (
        df.select("event_type", FF.expr(h60).alias("h"))
        .select("event_type", FF.expr(reg).alias("r"), FF.expr(rank).alias("k"))
        .groupBy("event_type", "r")
        .agg(FF.max("k").alias("mk"))
    )
    import math

    got = regs.groupBy("event_type").agg(
        FF.sum(
            FF.expr(
                f"cast(pow(cast(2 as decimal(38,0)),"
                f" {sketches._HLL_WBITS + 1} - mk) as decimal(38,0))"
            )
        ).alias("s"),
        FF.count(FF.lit(1)).alias("m_used"),
    ).collect()[0]
    m = sketches.HLL_M
    s_total = float(got["s"]) + (m - got["m_used"]) * float(
        2 ** (sketches._HLL_WBITS + 1)
    )
    est = (
        sketches.HLL_ALPHA
        * m
        * m
        * float(2 ** (sketches._HLL_WBITS + 1))
        / s_total
    )
    assert abs(est - 10_000) <= sketches.HLL_TOL * 10_000


def test_kmv_overlap_accuracy(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import sketches

    rows = sketches.kmv_overlap_query(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5 event types, 2)
    tol = 3.0 / (sketches.KMV_K ** 0.5)  # ~3 sigma of a K-sample mean
    for r in rows:
        assert 0.0 <= r["kmv_jaccard"] <= 1.0
        # when a set is smaller than K the sketch IS the set -> exact
        if max(r["n_a"], r["n_b"]) <= sketches.KMV_K:
            assert abs(r["kmv_jaccard"] - r["exact_jaccard"]) < 1e-12
        else:
            assert abs(r["kmv_jaccard"] - r["exact_jaccard"]) <= tol


def test_cusum_locates_injected_level_shift(spark, monkeypatch):
    """30 days at 100/day then 30 days at 200/day: the |CUSUM| peak
    must land exactly on the last low day (the shift boundary), with
    direction 'down' (pre-shift counts below the overall mean)."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(60):
        n = 100 if d < 30 else 200
        for i in range(n):
            eid += 1
            rows.append(
                Row(
                    event_id=eid,
                    user_id=1,
                    event_type="click",
                    value=1.0,
                    ts=t0 + datetime.timedelta(days=d, seconds=i),
                )
            )
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(stats.tables, "table", lambda *a: df)
    r = stats.cusum_changepoint_query(spark, "_").collect()[0]
    assert r["changepoint_day"] == datetime.date(2024, 1, 30)
    assert r["direction"] == "down"
    # peak magnitude: at the boundary, n*prefix - i*S
    # = 60*(30*100) - 30*(30*100+30*200) = 180000 - 270000 = -90000... *n scale
    n, i, prefix, S = 60, 30, 30 * 100, 30 * 100 + 30 * 200
    assert r["cusum_scaled"] == n * prefix - i * S


def test_freshness_audit_reference_point(spark, sf_dir):
    rows = dq.freshness_audit_query(spark, sf_dir).collect()
    assert rows
    lags = [r["lag_minutes"] for r in rows]
    assert min(lags) == 0, "the globally newest type has zero lag"
    assert all(lag >= 0 for lag in lags)
    assert all(r["n_last_day"] >= 0 for r in rows)


def test_enum_domain_audit_clean_and_dirty(spark, sf_dir, monkeypatch):
    rows = {r["contract"]: r for r in dq.enum_domain_audit_query(spark, sf_dir).collect()}
    assert set(rows) == {f"{t}.{c}" for t, c, _ in dq._ENUM_DOMAINS}
    for r in rows.values():
        assert r["n_violations"] == 0 and r["example_value"] is None
    # inject drift: a new event_type value must surface with an example
    from _kafka_streams_scaffold_spark import tables as _t

    real = _t.table

    def patched(sp, sf, name):
        df = real(sp, sf, name)
        if name == "events":
            return df.withColumn(
                "event_type",
                F.when(F.col("event_id") % 100 == 0, F.lit("zz_new"))
                .otherwise(F.col("event_type")),
            )
        return df

    monkeypatch.setattr(dq.tables, "table", patched)
    rows2 = {r["contract"]: r for r in dq.enum_domain_audit_query(
        spark, sf_dir
    ).collect()}
    r = rows2["events.event_type"]
    assert r["n_violations"] > 0
    assert r["example_value"] == "zz_new"


def test_debounce_conserves_events(spark, sf_dir):
    from _kafka_streams_scaffold_spark import tables as _t
    from _kafka_streams_scaffold_spark.operators import analytics as an_mod

    rows = an_mod.debounce_events_query(spark, sf_dir).collect()
    total = sum(r["n_kept"] + r["n_suppressed"] for r in rows)
    assert total == _t.table(spark, sf_dir, "events").count()
    for r in rows:
        assert 0.0 <= r["suppression_rate"] < 1.0


def test_readability_prose_vs_junk(spark, monkeypatch):
    prose = (
        "The cat sat on the mat. It was warm. The sun was out. "
        "They slept all day."
    )
    junk = "xzqj kkkkk zzzz qqqq jjjj wwww xxxx yyyy zzzz qqqq"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=prose), Row(doc_id=2, text=junk),
         Row(doc_id=3, text="")]
    )
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    rows = {r["doc_id"]: r for r in textops.readability_query(spark, "_").collect()}
    assert rows[1]["flesch"] is not None
    assert rows[1]["flesch"] > 60, "simple prose reads easy"
    # consonant junk has ~no vowel groups -> few syllables but also no
    # sentences beyond one fragment; empty doc must be NULL, not error
    assert rows[3]["flesch"] is None


def test_weekly_autocorr_detects_injected_cycle(spark, monkeypatch):
    """70 days alternating weekly 100/200 by ISO week parity -> strong
    positive lag-7 autocorrelation; a flat series yields NULL (zero
    variance)."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(70):
        week = d // 7
        n = 200 if week % 2 == 0 else 100
        n_flat = 50
        for i in range(n):
            eid += 1
            rows.append(Row(event_id=eid, user_id=1, event_type="cyc",
                            value=1.0,
                            ts=t0 + datetime.timedelta(days=d, seconds=i)))
        for i in range(n_flat):
            eid += 1
            rows.append(Row(event_id=eid, user_id=1, event_type="flat",
                            value=1.0,
                            ts=t0 + datetime.timedelta(days=d, seconds=i)))
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(stats.tables, "table", lambda *a: df)
    out = {r["event_type"]: r for r in stats.weekly_autocorr_query(
        spark, "_"
    ).collect()}
    # lag-7 pairs cross week boundaries: weeks alternate, so x and y
    # are perfectly ANTI-correlated at lag 7 (100 vs 200) -> r = -1
    assert out["cyc"]["autocorr"] is not None
    assert out["cyc"]["autocorr"] < -0.99
    assert out["flat"]["autocorr"] is None  # zero variance


def test_segment_trend_recovers_injected_slope(spark, monkeypatch):
    """Daily counts 100 + 5*day fit exactly: slope 5, intercept 100."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(20):
        for i in range(100 + 5 * d):
            eid += 1
            rows.append(Row(event_id=eid, user_id=1, event_type="g",
                            value=1.0,
                            ts=t0 + datetime.timedelta(days=d, seconds=i)))
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(stats.tables, "table", lambda *a: df)
    r = stats.segment_trend_query(spark, "_").collect()[0]
    assert abs(r["slope_per_day"] - 5.0) < 1e-9
    assert abs(r["intercept"] - 100.0) < 1e-9


def test_salted_join_equals_plain_join(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import skew

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    plain = sorted(
        (r["k"], r["l_quantity"], r["o_totalprice"])
        for r in li.join(orders, "k").collect()
    )
    salted = sorted(
        (r["k"], r["l_quantity"], r["o_totalprice"])
        for r in skew.salted_join(li, orders, "k").collect()
    )
    assert salted == plain and plain
