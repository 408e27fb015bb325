"""Data-quality audit: declarative row-level constraints evaluated as
one pass per table plus one anti-join for referential integrity — the
gate a 100 TB ingest runs before anything downstream trains on the
data.

Shape notes (100 TB posture): every range/null rule on the same table
folds into a SINGLE scan via conditional-sum aggregation (no
rule-per-scan fan-out); the FK orphan check is the only join and keys
on the fact's join column (left_anti, so Spark picks broadcast/SMJ by
the dimension's true size). The result is |rules| rows of counts —
nothing wide ever shuffles.

NULL semantics: a range rule written as SUM(CASE WHEN col <= 0 ...)
silently PASSES null values (the predicate is NULL, not true), so
every range-checked column also carries an explicit isNull rule —
otherwise a column going fully null would sail through the audit
unreported, the exact silent-drop-out failure this gate exists to
catch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables


def _cnt(cond: F.Column) -> F.Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")


def data_quality_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation counts per named rule, always emitting every rule
    (zero-violation rules appear with 0 — an audit that silently drops
    a rule row is indistinguishable from one that never ran it).
    """
    li = tables.table(spark, sf_dir, "lineitem")
    orders = tables.table(spark, sf_dir, "orders")

    li_rules = li.agg(
        _cnt(F.col("l_orderkey").isNull()).alias("li_null_orderkey"),
        _cnt(F.col("l_quantity") <= 0).alias("li_nonpositive_qty"),
        _cnt(F.col("l_quantity").isNull()).alias("li_null_qty"),
        _cnt(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
        ).alias("li_discount_range"),
        _cnt(F.col("l_discount").isNull()).alias("li_null_discount"),
        _cnt(F.col("l_extendedprice") < 0).alias("li_negative_price"),
        _cnt(F.col("l_extendedprice").isNull()).alias("li_null_price"),
        _cnt(F.col("l_tax") < 0).alias("li_negative_tax"),
        _cnt(F.col("l_tax").isNull()).alias("li_null_tax"),
    )
    o_rules = orders.agg(
        _cnt(F.col("o_custkey").isNull()).alias("o_null_custkey"),
        _cnt(F.col("o_totalprice") <= 0).alias("o_nonpositive_total"),
        _cnt(F.col("o_totalprice").isNull()).alias("o_null_total"),
    )
    orphans = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("li_orphan_orderkey"))
    )
    wide = li_rules.crossJoin(o_rules).crossJoin(orphans)
    rules = [
        "li_null_orderkey", "li_nonpositive_qty", "li_null_qty",
        "li_discount_range", "li_null_discount",
        "li_negative_price", "li_null_price",
        "li_negative_tax", "li_null_tax",
        "o_null_custkey", "o_nonpositive_total", "o_null_total",
        "li_orphan_orderkey",
    ]
    stacked = ", ".join(f"'{r}', {r}" for r in rules)
    return wide.selectExpr(
        f"stack({len(rules)}, {stacked}) AS (rule, n_violations)"
    )


def _null_rule_sql(name: str, col: str, tbl: str) -> str:
    return (
        f"SELECT '{name}', "
        f"CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        f"FROM {tbl}"
    )


DATA_QUALITY_AUDIT_ORACLE = f"""
SELECT 'li_null_orderkey' AS rule,
       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations
FROM lineitem
UNION ALL
SELECT 'li_nonpositive_qty',
       CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
{_null_rule_sql('li_null_qty', 'l_quantity', 'lineitem')}
UNION ALL
SELECT 'li_discount_range',
       CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
{_null_rule_sql('li_null_discount', 'l_discount', 'lineitem')}
UNION ALL
SELECT 'li_negative_price',
       CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
{_null_rule_sql('li_null_price', 'l_extendedprice', 'lineitem')}
UNION ALL
SELECT 'li_negative_tax',
       CAST(SUM(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
{_null_rule_sql('li_null_tax', 'l_tax', 'lineitem')}
UNION ALL
SELECT 'o_null_custkey',
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_nonpositive_total',
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
{_null_rule_sql('o_null_total', 'o_totalprice', 'orders')}
UNION ALL
SELECT 'li_orphan_orderkey',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem l
WHERE NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
)
"""
