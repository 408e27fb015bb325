"""Deterministic statistics tests: power-sum aggregates vs numpy on
crafted data, exact-median semantics for odd/even groups."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import stats


def _frames(spark, balances, spends, segment="SEG"):
    cust = spark.createDataFrame(
        [
            Row(c_custkey=i, c_mktsegment=segment, c_acctbal=float(b))
            for i, b in enumerate(balances)
        ]
    )
    orders = spark.createDataFrame(
        [
            Row(o_custkey=i, o_totalprice=float(s))
            for i, s in enumerate(spends)
        ]
    )
    return {"customer": cust, "orders": orders}


def _patch(monkeypatch, frames):
    monkeypatch.setattr(
        stats.tables, "table", lambda spark_, sf, name: frames[name]
    )


def test_segment_stats_match_numpy(spark, monkeypatch):
    bal = [10.0, 20.0, 30.0, 40.0, 55.5]
    spend = [100.0, 210.0, 290.0, 410.0, 500.25]
    _patch(monkeypatch, _frames(spark, bal, spend))
    [r] = stats.segment_spend_stats_query(spark, "_").collect()
    assert r["n_cust"] == 5
    assert r["avg_spend"] == pytest.approx(np.mean(spend), rel=1e-12)
    assert r["stddev_spend"] == pytest.approx(np.std(spend, ddof=1), rel=1e-12)
    assert r["corr_bal_spend"] == pytest.approx(
        np.corrcoef(bal, spend)[0, 1], rel=1e-12
    )
    slope = np.polyfit(bal, spend, 1)[0]
    assert r["slope_spend_per_bal"] == pytest.approx(slope, rel=1e-12)


def test_segment_stats_multi_order_customers(spark, monkeypatch):
    # two orders for customer 0 must aggregate to one spend point
    frames = _frames(spark, [10.0, 20.0, 30.0], [1.0, 2.0, 3.0])
    extra = frames["orders"].sparkSession.createDataFrame(
        [Row(o_custkey=0, o_totalprice=9.0)]
    )
    frames["orders"] = frames["orders"].union(extra)
    _patch(monkeypatch, frames)
    [r] = stats.segment_spend_stats_query(spark, "_").collect()
    spends = [10.0, 2.0, 3.0]
    assert r["avg_spend"] == pytest.approx(np.mean(spends), rel=1e-12)


def test_median_odd_and_even_groups(spark, monkeypatch):
    cust = spark.createDataFrame(
        [Row(c_custkey=i, c_mktsegment="ODD" if i < 3 else "EVEN",
             c_acctbal=0.0) for i in range(7)]
    )
    orders = spark.createDataFrame(
        [
            # ODD group spends: 10, 20, 90 -> median 20, one middle row
            Row(o_custkey=0, o_totalprice=10.0),
            Row(o_custkey=1, o_totalprice=20.0),
            Row(o_custkey=2, o_totalprice=90.0),
            # EVEN group spends: 1, 2, 3, 100 -> median 2.5, two rows
            Row(o_custkey=3, o_totalprice=1.0),
            Row(o_custkey=4, o_totalprice=2.0),
            Row(o_custkey=5, o_totalprice=3.0),
            Row(o_custkey=6, o_totalprice=100.0),
        ]
    )
    _patch(monkeypatch, {"customer": cust, "orders": orders})
    got = {
        r["c_mktsegment"]: (r["median_spend"], r["n_median_rows"])
        for r in stats.segment_spend_median_query(spark, "_").collect()
    }
    assert got["ODD"] == (pytest.approx(20.0), 1)
    assert got["EVEN"] == (pytest.approx(2.5), 2)


def test_median_ties_resolve_totally(spark, monkeypatch):
    # all-equal spends: any middle rows give the same median; the dual
    # row_number still selects exactly 1 (odd) rows
    _patch(monkeypatch, _frames(spark, [0.0] * 5, [7.0] * 5))
    [r] = stats.segment_spend_median_query(spark, "_").collect()
    assert r["median_spend"] == pytest.approx(7.0)
    assert r["n_median_rows"] == 1


def test_winsorized_stats_clamps_outliers(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import stats as st

    # 100 values 1..100 for one type: p1 row is rank 1 (value 1.0),
    # p99 row is rank 99 (value 99.0); the 100.0 outlier clamps to 99.
    rows = [
        Row(event_type="click", event_id=i, value=float(i))
        for i in range(1, 101)
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(st.tables, "table", lambda *a: df)
    r = st.winsorized_event_stats_query(spark, "_").collect()[0]
    assert (r["n"], r["p1"], r["p99"]) == (100, 1.0, 99.0)
    # mean of 1..99 plus the clamped 99 = (4950 + 99) / 100
    assert r["winsor_mean"] == pytest.approx(50.49)


def test_winsorized_stats_small_group_degenerates_to_identity(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import stats as st

    # n=3: p1 rank = ceil(3/100) = 1, p99 rank = ceil(297/100) = 3 —
    # thresholds are min and max, clamping is the identity.
    rows = [Row(event_type="view", event_id=i, value=v)
            for i, v in enumerate([5.0, 7.0, 9.0])]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(st.tables, "table", lambda *a: df)
    r = st.winsorized_event_stats_query(spark, "_").collect()[0]
    assert (r["p1"], r["p99"]) == (5.0, 9.0)
    assert r["winsor_mean"] == pytest.approx(7.0)


def test_data_quality_audit_counts_violations(spark, monkeypatch):
    import datetime as dt

    from _kafka_streams_scaffold_spark.operators import dq

    li = spark.createDataFrame([
        Row(l_orderkey=1, l_quantity=5.0, l_discount=0.1,
            l_extendedprice=100.0, l_tax=0.05),
        Row(l_orderkey=2, l_quantity=-1.0, l_discount=1.5,     # 2 rules hit
            l_extendedprice=-5.0, l_tax=-0.1),                 # +2 more
        Row(l_orderkey=99, l_quantity=1.0, l_discount=0.0,     # orphan
            l_extendedprice=1.0, l_tax=0.0),
        Row(l_orderkey=1, l_quantity=None, l_discount=None,    # nulls slip
            l_extendedprice=None, l_tax=None),                 # range rules
    ])
    orders = spark.createDataFrame([
        Row(o_orderkey=1, o_custkey=1, o_totalprice=100.0),
        Row(o_orderkey=2, o_custkey=2, o_totalprice=-3.0),     # 1 rule hit
        Row(o_orderkey=3, o_custkey=3, o_totalprice=None),     # null total
    ])
    frames = {"lineitem": li, "orders": orders}
    monkeypatch.setattr(dq.tables, "table",
                        lambda s, sf, name: frames[name])
    got = {r["rule"]: r["n_violations"]
           for r in dq.data_quality_audit_query(spark, "_").collect()}
    # The all-null lineitem row hits NO range rule (NULL predicates are
    # not true) — exactly why each range-checked column carries its own
    # isNull rule; without them that row would pass the audit silently.
    assert got == {
        "li_null_orderkey": 0,
        "li_nonpositive_qty": 1,
        "li_null_qty": 1,
        "li_discount_range": 1,
        "li_null_discount": 1,
        "li_negative_price": 1,
        "li_null_price": 1,
        "li_negative_tax": 1,
        "li_null_tax": 1,
        "o_null_custkey": 0,
        "o_nonpositive_total": 1,
        "o_null_total": 1,
        "li_orphan_orderkey": 1,
    }


def test_event_anomalies_flags_only_outliers(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import stats as st

    # 50 values at 10.0 +- 1 and one at 100.0: only the spike crosses
    # 3 sigma; a constant-valued type (std=0) emits nothing.
    rows = (
        [Row(event_type="click", event_id=i, value=10.0 + (i % 2))
         for i in range(50)]
        + [Row(event_type="click", event_id=999, value=100.0)]
        + [Row(event_type="view", event_id=i, value=5.0)
           for i in range(1000, 1010)]
    )
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(st.tables, "table", lambda *a: df)
    got = st.event_anomalies_query(spark, "_").collect()
    assert [(r["event_id"], r["event_type"]) for r in got] == [(999, "click")]
    assert got[0]["zscore"] > 3


def test_robust_outliers_mad_resists_burst(spark, monkeypatch):
    """A single extreme burst must be flagged by the MAD gate even
    though it inflates mean/std enough to shrink its own z-score."""
    from pyspark.sql import Row

    from _kafka_streams_scaffold_spark.operators import stats as st_mod

    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 1000.0]
    df = spark.createDataFrame(
        [
            Row(event_id=i, event_type="click", value=v)
            for i, v in enumerate(vals)
        ]
    )
    monkeypatch.setattr(st_mod.tables, "table", lambda *a: df)
    row = st_mod.robust_event_outliers_query(spark, "_").collect()[0]
    assert row["n"] == 8
    # median sits in the bulk; the 1000.0 burst is the only outlier
    assert 9.0 <= row["median"] <= 11.0
    assert row["n_outliers"] == 1
    assert row["mad"] > 0
