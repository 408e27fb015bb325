"""Analytics operator tests: golden semantics on crafted frames plus
physical-plan assertions (pushdown / pruning / broadcast) — the plan
shape IS the 100 TB contract, so it's tested like behavior."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from _kafka_streams_scaffold_spark import plans
from _kafka_streams_scaffold_spark.operators import analytics


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_sessionization_golden(spark, sf_dir, monkeypatch):
    rows = [
        Row(event_id=1, user_id=1, ts=_ts("2024-01-01T00:00:00")),
        Row(event_id=2, user_id=1, ts=_ts("2024-01-01T00:10:00")),  # same session
        Row(event_id=3, user_id=1, ts=_ts("2024-01-01T01:00:00")),  # new (50m gap)
        Row(event_id=4, user_id=2, ts=_ts("2024-01-01T00:00:00")),
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(
        analytics.tables, "table", lambda spark_, sf, name: df
    )
    got = {
        r["user_id"]: (r["n_sessions"], r["max_session_events"], r["total_events"])
        for r in analytics.user_sessions_query(spark, sf_dir).collect()
    }
    assert got == {1: (2, 2, 3), 2: (1, 1, 1)}


def test_asof_strictly_prior(spark, sf_dir, monkeypatch):
    rows = [
        Row(event_id=1, user_id=1, ts=_ts("2024-01-01T00:00:00"), event_type="purchase"),
        Row(event_id=2, user_id=1, ts=_ts("2024-01-01T00:05:00"), event_type="click"),
        Row(event_id=3, user_id=1, ts=_ts("2024-01-01T00:06:00"), event_type="purchase"),
        Row(event_id=4, user_id=1, ts=_ts("2024-01-01T00:07:00"), event_type="click"),
        # click before any purchase -> null
        Row(event_id=5, user_id=2, ts=_ts("2024-01-01T00:00:00"), event_type="click"),
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(analytics.tables, "table", lambda *a: df)
    got = {
        r["event_id"]: r["prev_purchase_ts"]
        for r in analytics.asof_prev_purchase_query(spark, sf_dir).collect()
    }
    assert got[2] == _ts("2024-01-01T00:00:00")
    assert got[4] == _ts("2024-01-01T00:06:00")
    assert got[5] is None


def test_pricing_summary_plan_pushdown(spark, sf_dir):
    df = analytics.pricing_summary_query(spark, sf_dir)
    # The shipdate filter must reach the parquet scan...
    assert any("l_shipdate" in f for f in plans.pushed_filters(df))
    # ...and the scan must NOT read columns the query never uses.
    (cols,) = plans.read_schema_columns(df)
    assert "l_partkey" not in cols and "l_orderkey" not in cols
    assert set(cols) >= {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    df = analytics.local_supplier_revenue_query(spark, sf_dir)
    assert plans.has_broadcast_join(df)


def test_top_orders_deterministic_tiebreak(spark, sf_dir, monkeypatch):
    rows = [
        Row(o_custkey=1, o_orderkey=k, o_totalprice=100.0) for k in (5, 3, 1, 9)
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(analytics.tables, "table", lambda *a: df)
    got = [
        (r["o_orderkey"], r["rn"])
        for r in analytics.top_orders_per_customer_query(spark, sf_dir)
        .orderBy("rn")
        .collect()
    ]
    assert got == [(1, 1), (3, 2), (5, 3)]  # equal prices -> lowest key wins


def test_top_events_uses_takeordered(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import sketches

    df = sketches.top_events_query(spark, sf_dir)
    # Global top-k must be a per-partition heap + driver merge of k,
    # never a full sort: at 100 TB a global sort would shuffle the
    # whole table for 20 rows.
    assert "TakeOrderedAndProject" in plans.explain_str(df)


def test_tfidf_small_sides_broadcast(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import textops

    df = textops.tfidf_top_terms_query(spark, sf_dir)
    s = plans.explain_str(df)
    # df (vocabulary-sized) joins broadcast; the scalar corpus size
    # rides a broadcast nested-loop. Neither may shuffle the tf table
    # a second time.
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s


def test_pivot_is_single_aggregation(spark, sf_dir):
    df = analytics.events_pivot_query(spark, sf_dir)
    # Declared pivot values -> one hash aggregate pair (partial+final),
    # no per-value scans and no inference job in the plan.
    assert len(plans.read_schema_columns(df)) == 1


def test_rolling_window_single_shuffle(spark, sf_dir):
    import re

    df = analytics.rolling_user_value_query(spark, sf_dir)
    s = plans.explain_str(df)
    # One exchange: hash partition on user_id for the window sort.
    # (formatted explain mentions each node twice: tree + details)
    assert len(set(re.findall(r"\((\d+)\) Exchange", s))) == 1


def test_retention_cohorts_golden(spark, monkeypatch):
    import datetime as dt

    from _kafka_streams_scaffold_spark.operators import analytics

    def ev(user, ts):
        return Row(user_id=user, ts=dt.datetime.fromisoformat(ts),
                   event_type="click", event_id=0, value=0.0, props="{}")

    rows = [
        # cohort week of 2024-01-01 (Monday): users 1, 2
        ev(1, "2024-01-01T10:00:00"),
        ev(1, "2024-01-08T10:00:00"),   # retained week 1
        ev(1, "2024-01-09T12:00:00"),   # same week, no double count
        ev(2, "2024-01-03T10:00:00"),
        # cohort week of 2024-01-08: user 3
        ev(3, "2024-01-10T10:00:00"),
        ev(3, "2024-01-22T10:00:00"),   # retained week 2
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(analytics.tables, "table", lambda *a: df)
    got = {
        (str(r["cohort_week"]), r["week_k"]): (r["retained"], r["cohort_size"],
                                               r["retention"])
        for r in analytics.retention_cohorts_query(spark, "_").collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 2, 1.0),
        ("2024-01-01", 1): (1, 2, 0.5),
        ("2024-01-08", 0): (1, 1, 1.0),
        ("2024-01-08", 2): (1, 1, 1.0),
    }
