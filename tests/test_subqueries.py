"""Subquery-shape tests: golden semantics on crafted frames plus the
physical-plan properties (broadcast one-row scalars, pushdown) that
make these shapes survive at 100 TB."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from _kafka_streams_scaffold_spark import plans
from _kafka_streams_scaffold_spark.operators import subqueries


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _patch_tables(monkeypatch, frames):
    monkeypatch.setattr(
        subqueries.tables, "table", lambda spark_, sf, name: frames[name]
    )


def test_cust_order_counts_golden(spark, sf_dir, monkeypatch):
    cust = spark.createDataFrame(
        [Row(c_custkey=i, c_name=f"c{i}") for i in (1, 2, 3)]
    )
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=10, o_custkey=1, o_orderpriority="5-LOW"),
            Row(o_orderkey=11, o_custkey=1, o_orderpriority="3-MEDIUM"),
            Row(o_orderkey=12, o_custkey=1, o_orderpriority="1-URGENT"),
            Row(o_orderkey=13, o_custkey=2, o_orderpriority="1-URGENT"),
        ]
    )
    _patch_tables(monkeypatch, {"customer": cust, "orders": orders})
    got = {
        r["c_count"]: r["custdist"]
        for r in subqueries.cust_order_counts_query(spark, sf_dir).collect()
    }
    # c1 has 2 non-urgent orders; c2's only order is urgent (left join
    # keeps the customer at 0); c3 has none at all.
    assert got == {2: 1, 0: 2}


def test_promo_revenue_golden(spark, sf_dir, monkeypatch):
    part = spark.createDataFrame(
        [
            Row(p_partkey=1, p_type="PROMO"),
            Row(p_partkey=2, p_type="LARGE"),
        ]
    )
    li = spark.createDataFrame(
        [
            Row(l_partkey=1, l_extendedprice=100.0, l_discount=0.0,
                l_shipdate=_ts("1997-06-10")),
            Row(l_partkey=2, l_extendedprice=100.0, l_discount=0.0,
                l_shipdate=_ts("1997-06-20")),
            # outside the month window -> excluded
            Row(l_partkey=1, l_extendedprice=999.0, l_discount=0.0,
                l_shipdate=_ts("1997-08-01")),
        ]
    )
    _patch_tables(monkeypatch, {"lineitem": li, "part": part})
    [row] = subqueries.promo_revenue_query(spark, sf_dir).collect()
    assert row["promo_revenue_pct"] == pytest.approx(50.0)


def test_top_value_parts_golden(spark, sf_dir, monkeypatch):
    li = spark.createDataFrame(
        [
            Row(l_partkey=1, l_extendedprice=10.0, l_discount=0.0),
            Row(l_partkey=2, l_extendedprice=1.0, l_discount=0.0),
            Row(l_partkey=3, l_extendedprice=1.0, l_discount=0.0),
        ]
    )
    _patch_tables(monkeypatch, {"lineitem": li})
    got = subqueries.top_value_parts_query(spark, sf_dir).collect()
    # mean value = 4, threshold = 6 -> only part 1 (value 10) survives
    assert [(r["l_partkey"], r["part_value"]) for r in got] == [(1, 10.0)]


def test_brand_disjunction_revenue_golden(spark, sf_dir, monkeypatch):
    part = spark.createDataFrame(
        [
            Row(p_partkey=1, p_brand="Brand#12", p_size=5),
            Row(p_partkey=2, p_brand="Brand#23", p_size=25),  # size > 20
            Row(p_partkey=3, p_brand="Brand#34", p_size=30),
        ]
    )
    li = spark.createDataFrame(
        [
            Row(l_partkey=1, l_quantity=5.0, l_extendedprice=10.0, l_discount=0.0),
            Row(l_partkey=2, l_quantity=15.0, l_extendedprice=99.0, l_discount=0.0),
            Row(l_partkey=3, l_quantity=25.0, l_extendedprice=20.0, l_discount=0.0),
        ]
    )
    _patch_tables(monkeypatch, {"lineitem": li, "part": part})
    [row] = subqueries.brand_disjunction_revenue_query(spark, sf_dir).collect()
    assert row["revenue"] == pytest.approx(30.0)


def test_idle_rich_customers_golden(spark, sf_dir, monkeypatch):
    cust = spark.createDataFrame(
        [
            Row(c_custkey=1, c_acctbal=100.0, c_mktsegment="AUTOMOBILE"),
            Row(c_custkey=2, c_acctbal=100.0, c_mktsegment="AUTOMOBILE"),
            Row(c_custkey=3, c_acctbal=10.0, c_mktsegment="MACHINERY"),
            Row(c_custkey=4, c_acctbal=-50.0, c_mktsegment="MACHINERY"),
        ]
    )
    orders = spark.createDataFrame(
        [
            Row(o_custkey=1, o_orderdate=_ts("1998-05-01")),  # recent -> excluded
            Row(o_custkey=2, o_orderdate=_ts("1997-05-01")),  # stale -> kept
        ]
    )
    _patch_tables(monkeypatch, {"customer": cust, "orders": orders})
    got = {
        r["c_mktsegment"]: (r["numcust"], r["totacctbal"])
        for r in subqueries.idle_rich_customers_query(spark, sf_dir).collect()
    }
    # avg positive balance = 70; only c1/c2 exceed it; c1 ordered recently
    assert got == {"AUTOMOBILE": (1, 100.0)}


# -- physical-plan contracts ------------------------------------------------


def test_promo_revenue_plan(spark, sf_dir):
    df = subqueries.promo_revenue_query(spark, sf_dir)
    # month-window filter must reach the parquet scan; part side broadcast
    assert any("l_shipdate" in f for f in plans.pushed_filters(df))
    assert plans.has_broadcast_join(df)


def test_top_value_parts_plan_single_scan(spark, sf_dir):
    df = subqueries.top_value_parts_query(spark, sf_dir)
    # grand total arrives via broadcast (a nested-loop join against
    # exactly one row), never a shuffle of the per-part aggregate
    # against itself
    explained = plans.explain_str(df)
    assert "BroadcastNestedLoopJoin" in explained
    assert "SortMergeJoin" not in explained


def test_latest_shipper_strictness_golden(spark, monkeypatch):
    """Q21-shape tie semantics: a supplier wins an order only when its
    last ship date is STRICTLY later than every other supplier's;
    order-wide ties produce no winner, single-supplier orders never
    qualify."""
    li = spark.createDataFrame(
        [
            # order 1: supplier 1 strictly latest -> wins
            Row(l_orderkey=1, l_suppkey=1, l_shipdate=_ts("1997-03-02")),
            Row(l_orderkey=1, l_suppkey=2, l_shipdate=_ts("1997-03-01")),
            # order 2: tie at the max -> nobody wins
            Row(l_orderkey=2, l_suppkey=1, l_shipdate=_ts("1997-05-05")),
            Row(l_orderkey=2, l_suppkey=2, l_shipdate=_ts("1997-05-05")),
            # order 3: single supplier -> no EXISTS, never qualifies
            Row(l_orderkey=3, l_suppkey=3, l_shipdate=_ts("1997-07-07")),
            # order 4: supplier 3 latest across two of its own lines
            Row(l_orderkey=4, l_suppkey=3, l_shipdate=_ts("1997-01-01")),
            Row(l_orderkey=4, l_suppkey=3, l_shipdate=_ts("1997-02-01")),
            Row(l_orderkey=4, l_suppkey=1, l_shipdate=_ts("1997-01-15")),
        ]
    )
    supp = spark.createDataFrame(
        [Row(s_suppkey=i, s_name=f"s{i}") for i in (1, 2, 3)]
    )
    _patch_tables(monkeypatch, {"lineitem": li, "supplier": supp})
    got = {
        r["s_name"]: r["numwait"]
        for r in subqueries.latest_shipper_counts_query(spark, "_").collect()
    }
    assert got == {"s1": 1, "s3": 1}


def test_bulk_part_suppliers_threshold_golden(spark, monkeypatch):
    li = spark.createDataFrame(
        [
            # part 1: supplier 1 ships 30/100 (> 1/5), supplier 2 ships 70
            Row(l_partkey=1, l_suppkey=1, l_quantity=30.0),
            Row(l_partkey=1, l_suppkey=2, l_quantity=70.0),
            # part 2: supplier 3 ships exactly 1/5 -> NOT bulk (strict >)
            Row(l_partkey=2, l_suppkey=3, l_quantity=20.0),
            Row(l_partkey=2, l_suppkey=1, l_quantity=80.0),
        ]
    )
    supp = spark.createDataFrame(
        [Row(s_suppkey=i, s_name=f"s{i}", s_nationkey=i) for i in (1, 2, 3)]
    )
    _patch_tables(monkeypatch, {"lineitem": li, "supplier": supp})
    got = {
        r["s_name"]
        for r in subqueries.bulk_part_suppliers_query(spark, "_").collect()
    }
    assert got == {"s1", "s2"}
