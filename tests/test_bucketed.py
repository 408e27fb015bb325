"""Bucketed-table contract: same-key same-count bucketed tables join
with ZERO Exchange (the write-time co-location that replaces the
reference's co-partitioned Kafka topics), and a mismatched side
falls back to shuffling — both asserted on the physical plan."""

from __future__ import annotations

import pytest

from _kafka_streams_scaffold_spark.plans import inspect as pi
from _kafka_streams_scaffold_spark.sources import bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    bucketed.write_bucketed(orders, "t_orders_b8", "o_orderkey", 8)
    bucketed.write_bucketed(li, "t_lineitem_b8", "o_orderkey", 8)
    bucketed.write_bucketed(li, "t_lineitem_b4", "o_orderkey", 4)
    yield None
    for t in ("t_orders_b8", "t_lineitem_b8", "t_lineitem_b4"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


from pyspark.sql import functions as F  # noqa: E402

import re


def _has_exchange(plan: str) -> bool:
    # shuffle Exchange nodes only (formatted tree prints "Exchange (n)";
    # BroadcastExchange is a different node and ReusedExchange is free)
    return bool(re.search(r"(?<!Broadcast)(?<!Reused)Exchange \(\d+\)", plan))


def test_matched_buckets_join_without_exchange(spark, bucketed_tables):
    # disable broadcast so the join must pick SMJ — the point is that
    # bucketing removes BOTH exchanges from the SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed.bucketed_join(
            spark, "t_orders_b8", "t_lineitem_b8", "o_orderkey"
        )
        df.write.format("noop").mode("overwrite").save()
        plan = pi.explain_str(df)
        assert not _has_exchange(plan), (
            "matched bucketed join must not shuffle either side"
        )
        # correctness: equals the plain parquet join
        n = df.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    raw = spark.table("t_orders_b8").join(
        spark.table("t_lineitem_b8"), "o_orderkey"
    )
    assert n == raw.count() > 0


def test_mismatched_bucket_count_shuffles_one_side(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed.bucketed_join(
            spark, "t_orders_b8", "t_lineitem_b4", "o_orderkey"
        )
        plan = pi.explain_str(df)
        # the 4-bucket side must re-shuffle to meet the 8-bucket side
        # (or both shuffle, depending on coalescing config) — either
        # way at least one Exchange appears
        assert _has_exchange(plan)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucket_key_groupby_needs_no_exchange(spark, bucketed_tables):
    df = spark.table("t_lineitem_b8").groupBy("o_orderkey").agg(
        F.sum("l_quantity")
    )
    plan = pi.explain_str(df)
    assert not _has_exchange(plan), (
        "aggregation on the bucket key must reuse the write-time "
        "partitioning"
    )
