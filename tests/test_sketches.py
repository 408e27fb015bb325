"""Sketch/quantile/top-k operator tests: golden semantics on crafted
frames; the HLL++ estimate is bound-checked against the exact count
(its only meaningful contract — estimates are engine-specific)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from _kafka_streams_scaffold_spark.operators import analytics, sketches


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(rows)


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in sketches.approx_distinct_users_query(spark, sf_dir).collect()
    }
    from _kafka_streams_scaffold_spark import tables

    exact = {
        r["event_type"]: r["n"]
        for r in tables.table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        # HLL++ with rsd=0.02; allow 5 sigma.
        assert abs(est - exact[k]) <= max(2.0, 5 * sketches.APPROX_RSD * exact[k])


def test_percentile_golden(spark, sf_dir, monkeypatch):
    rows = [
        Row(event_id=i, ts=_ts("2024-01-01T00:00:00"), user_id=1,
            event_type="click", value=float(v), props="{}")
        for i, v in enumerate([1, 2, 3, 4])
    ]
    monkeypatch.setattr(sketches.tables, "table", lambda *a: _events(spark, rows))
    got = sketches.value_percentiles_query(spark, "ignored").collect()[0]
    # Interpolated quantiles of [1,2,3,4]
    assert got["p25"] == 1.75
    assert got["p50"] == 2.5
    assert got["p75"] == 3.25


def test_top_events_deterministic_ties(spark, sf_dir, monkeypatch):
    rows = [
        Row(event_id=i, ts=_ts("2024-01-01T00:00:00"), user_id=1,
            event_type="click", value=v, props="{}")
        for i, v in [(3, 9.0), (1, 9.0), (2, 5.0), (4, 1.0)]
    ]
    monkeypatch.setattr(sketches.tables, "table", lambda *a: _events(spark, rows))
    got = [r["event_id"] for r in sketches.top_events_query(spark, "x").collect()]
    # value desc, event_id asc tiebreak
    assert got == [1, 3, 2, 4]


def test_hopping_window_two_windows_per_event(spark, sf_dir, monkeypatch):
    rows = [
        Row(event_id=1, ts=_ts("2024-01-01T00:40:00"), user_id=1,
            event_type="click", value=2.0, props="{}"),
    ]
    monkeypatch.setattr(analytics.tables, "table", lambda *a: _events(spark, rows))
    got = sorted(
        (r["w_start"], r["w_end"], r["cnt"])
        for r in analytics.events_hopping_query(spark, "x").collect()
    )
    # 00:40 falls in [00:00,01:00) and [00:30,01:30)
    assert got == [
        (_ts("2024-01-01T00:00:00"), _ts("2024-01-01T01:00:00"), 1),
        (_ts("2024-01-01T00:30:00"), _ts("2024-01-01T01:30:00"), 1),
    ]


def test_cube_grouping_flags(spark, sf_dir):
    df = analytics.revenue_cube_query(spark, sf_dir)
    rows = df.collect()
    # 4 grouping combinations present, flags disambiguate subtotals
    combos = {(r["g_returnflag"], r["g_linestatus"]) for r in rows}
    assert combos == {(0, 0), (0, 1), (1, 0), (1, 1)}
    grand = [r for r in rows if r["g_returnflag"] == 1 and r["g_linestatus"] == 1]
    assert len(grand) == 1 and grand[0]["l_returnflag"] is None
    detail_sum = sum(
        r["revenue"] for r in rows if (r["g_returnflag"], r["g_linestatus"]) == (0, 0)
    )
    assert abs(detail_sum - grand[0]["revenue"]) < 1e-6


def test_set_ops_golden(spark, sf_dir, monkeypatch):
    def ev(i, t, typ):
        return Row(event_id=i, ts=_ts(t), user_id=1, event_type=typ,
                   value=1.0, props="{}")

    rows = [
        ev(1, "2024-01-01T10:00:00", "click"),
        ev(2, "2024-01-01T11:00:00", "purchase"),   # day1: click AND purchase
        ev(3, "2024-01-02T10:00:00", "click"),       # day2: click only
        ev(4, "2024-01-03T10:00:00", "error"),
        ev(5, "2024-01-03T11:00:00", "signup"),      # day3: error AND signup
        ev(6, "2024-01-04T10:00:00", "error"),       # day4: error only
    ]
    monkeypatch.setattr(analytics.tables, "table", lambda *a: _events(spark, rows))
    no_purchase = {
        (r["user_id"], r["day"])
        for r in analytics.click_no_purchase_days_query(spark, "x").collect()
    }
    assert no_purchase == {(1, _ts("2024-01-02T00:00:00"))}
    both = {
        (r["user_id"], r["day"])
        for r in analytics.error_and_signup_days_query(spark, "x").collect()
    }
    assert both == {(1, _ts("2024-01-03T00:00:00"))}


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    approx = {
        r["event_type"]: [r[f"ap{int(q*100)}"] for q in sketches._QS]
        for r in sketches.approx_percentiles_query(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: [r[f"p{int(q*100)}"] for q in sketches._QS]
        for r in sketches.value_percentiles_query(spark, sf_dir).collect()
    }
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            # approx_percentile returns an actual data point near the
            # true quantile; tolerance scaled to the value range.
            assert abs(a - e) <= max(0.5, 0.05 * abs(e))


def test_tfidf_golden(spark, sf_dir, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import textops
    from pyspark.sql import Row

    rows = [
        Row(doc_id=1, text="apple banana apple", lang="en", source="s", n_chars=0),
        Row(doc_id=2, text="banana cherry", lang="en", source="s", n_chars=0),
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["rank"])
        for r in textops.tfidf_top_terms_query(spark, "x").collect()
    }
    # doc1: apple tf=2 df=1 idf=2 -> 4.0 rank1; banana tf=1 df=2 -> 1.0 rank2
    assert got[(1, "apple")] == (2, 1, 1)
    assert got[(1, "banana")] == (1, 2, 2)
    # doc2: cherry tf=1 df=1 -> 2.0 rank1 beats banana 1.0 rank2
    assert got[(2, "cherry")] == (1, 1, 1)
    assert got[(2, "banana")] == (1, 2, 2)


def test_value_histogram_boundaries(spark, sf_dir, monkeypatch):
    import datetime as dt

    from pyspark.sql import Row

    rows = [
        Row(event_id=i, user_id=1, ts=dt.datetime(2024, 1, 1), event_type="x",
            value=v, props="{}")
        for i, v in enumerate([-1.0, 0.0, 24.99, 25.0, 499.99, 500.0, 750.0])
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(sketches.tables, "table", lambda *a: df)
    got = {
        r["bucket"]: r["n"]
        for r in sketches.value_histogram_query(spark, sf_dir).collect()
    }
    # underflow 0; [0,25) -> 1; [25,50) -> 2; [475,500) -> 20; overflow 21
    assert got == {0: 1, 1: 2, 2: 1, 20: 1, 21: 2}


def test_heavy_hitters_guarantee_and_exact_counts(spark, sf_dir):
    """freqItems never misses an item above support, so in_sketch is
    universally true for the exactly-counted heavy hitters; counts
    match a direct groupBy."""
    out = {r["event_type"]: r for r in
           sketches.heavy_hitters_check_query(spark, sf_dir).collect()}
    assert out, "testdata must contain at least one >10% event type"
    ev = analytics.tables.table(spark, sf_dir, "events")
    total = ev.count()
    exact = {r["event_type"]: r["cnt"]
             for r in ev.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for et, row in out.items():
        assert row["in_sketch"] is True
        assert row["cnt"] == exact[et]
        assert row["cnt"] * sketches.HH_DENOM > total
    # completeness: every >support type is present
    for et, cnt in exact.items():
        if cnt * sketches.HH_DENOM > total:
            assert et in out
