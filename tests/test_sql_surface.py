"""The SQL door: temp-view registration and DataFrame/SQL parity —
the same logical query through ``spark.sql`` must produce the same
rows AND an equivalent physical plan (pushdown and broadcast survive
the SQL route)."""

from __future__ import annotations

from _kafka_streams_scaffold_spark import plans, sql
from _kafka_streams_scaffold_spark.operators import analytics


def test_register_views_covers_all_tables(spark, sf_dir):
    names = sql.register_views(spark, sf_dir)
    assert set(names) == set(
        ("region", "nation", "customer", "supplier", "part",
         "orders", "lineitem", "events", "documents", "embeddings")
    )
    for n in names:
        assert spark.table(n).count() >= 0  # resolvable


def test_sql_events_ts_is_normalized(spark, sf_dir):
    df = sql.sql(spark, sf_dir, "SELECT ts FROM events LIMIT 1")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_sql_matches_dataframe_result(spark, sf_dir):
    got_sql = sql.sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   AS sum_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY 1, 2
        """,
    ).collect()
    got_df = {
        (r["l_returnflag"], r["l_linestatus"]): r["sum_qty"]
        for r in analytics.pricing_summary_query(spark, sf_dir).collect()
    }
    for r in got_sql:
        assert got_df[(r["l_returnflag"], r["l_linestatus"])] == r["sum_qty"]


def test_sql_route_keeps_pushdown_and_broadcast(spark, sf_dir):
    df = sql.sql(
        spark,
        sf_dir,
        """
        SELECT n.n_name, COUNT(*) AS cnt
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3'
        GROUP BY 1
        """,
    )
    assert any("n_name" in f for f in plans.pushed_filters(df))
    assert plans.has_broadcast_join(df)
