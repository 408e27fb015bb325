"""Market-basket co-occurrence analysis over order line items.

The classic association-rule support/lift computation (Agrawal &
Srikant's apriori reduced to its pair tier — the part every production
"frequently bought together" pipeline actually ships). Reference scope
note: the Kafka Streams scaffold has no basket tier; this extends the
analytics family per the north-star brief.

Scale shape: pair generation is a SELF-JOIN ON THE ORDER KEY, so its
fan-out per order is C(basket_size, 2) — bounded by the schema's max
items per order (7 in TPC-H-shaped data), NEVER corpus-quadratic; the
join is co-partitioned on l_orderkey on both sides (one shuffle each,
same key). Item supports and the order count are partial-aggregatable
counts that join back by broadcast (item-support table is
|parts|-sized). Lift is a rational on exact BIGINT counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables

MIN_PAIR_SUPPORT = 3  # co-occurrence threshold for emitted pairs


def basket_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_a, part_b, n_both, n_a, n_b, n_orders, lift): part pairs
    co-occurring in at least MIN_PAIR_SUPPORT orders, with their
    supports and lift = n_both * n_orders / (n_a * n_b). lift > 1
    means the parts attract (bought together more than independence
    predicts); the support floor keeps noise pairs out and bounds the
    output."""
    li = tables.table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    both = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .filter(F.col("n_both") >= MIN_PAIR_SUPPORT)
    )
    support = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    n_orders = li.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    sa = support.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a"))
    sb = support.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b"))
    return (
        both.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            "n_orders",
            (
                F.col("n_both").cast("double")
                * F.col("n_orders").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )


BASKET_PAIRS_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_PAIR_SUPPORT}
),
support AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM items GROUP BY 1
),
total AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
  FROM lineitem
)
SELECT p.part_a, p.part_b, p.n_both, sa.n AS n_a, sb.n AS n_b, t.n_orders,
       CAST(p.n_both AS DOUBLE) * CAST(t.n_orders AS DOUBLE)
       / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)) AS lift
FROM pairs p
JOIN support sa ON sa.l_partkey = p.part_a
JOIN support sb ON sb.l_partkey = p.part_b
CROSS JOIN total t
"""
