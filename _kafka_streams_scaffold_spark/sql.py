"""SQL entry surface: register the driver's star schema as temp views
and run ad-hoc ANSI SQL against it.

The reference exposes its processing only through compiled topologies
(`streams/WordCountTopology.java` et al.); a Spark-first engine should
ALSO hand users the declarative door — every operator in this repo is
reachable from ``spark.sql`` once the tables are views, and Catalyst
applies the same pushdown/pruning/broadcast decisions either way
(``tests/test_sql_surface.py`` asserts DataFrame/SQL plan parity).

Views are plain temp views over the parquet relations — zero copy,
session-scoped, safe to re-register (CREATE OR REPLACE semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import tables


def register_views(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register every star-schema table as ``<prefix><name>`` temp
    view; returns the view names. The events view carries the same
    normalized ``ts`` the DataFrame path sees (tables.table owns the
    nanos/micros handling), so SQL users never meet the raw file type.
    """
    names = []
    for name in tables.TABLE_NAMES:
        view = f"{prefix}{name}"
        tables.table(spark, sf_dir, name).createOrReplaceTempView(view)
        names.append(view)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-call ad-hoc SQL over the star schema."""
    register_views(spark, sf_dir)
    return spark.sql(query)
