"""Storage-layout tests: the 100 TB posture depends on data layout as
much as plans — partition pruning must skip directories, and bucketed
tables must join without a shuffle. These are asserted on real writes
to tmp, not just documented."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark import plans, tables


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """A ship-month-partitioned lineitem read with a month predicate
    must show PartitionFilters and scan only matching directories."""
    li = tables.table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "li_by_month")
    (
        li.withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
        .write.partitionBy("ship_month")
        .parquet(out)
    )
    df = spark.read.parquet(out).filter(F.col("ship_month") == "1997-03")
    s = plans.explain_str(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", s)
    assert m and "ship_month" in m.group(1)
    # Pruned scan reads only the one directory's rows.
    expected = li.filter(
        F.date_format("l_shipdate", "yyyy-MM") == "1997-03"
    ).count()
    assert df.count() == expected > 0


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Both sides bucketed by the join key -> sort-merge join with NO
    Exchange: the co-located join that replaces the reference's
    repartition topics (and at 100 TB, the shuffle that would
    dominate)."""
    # warehouse.dir is a static conf; tables land in the session's
    # default warehouse and are dropped (with files) in the finally.
    orders = tables.table(spark, sf_dir, "orders")
    li = tables.table(spark, sf_dir, "lineitem")
    (
        orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
    )
    # Disable broadcast so the join strategy is the bucketed SMJ.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        s = plans.explain_str(j)
        assert "SortMergeJoin" in s
        assert len(set(re.findall(r"\((\d+)\) Exchange", s))) == 0
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_memory_store_max_keys_guard(spark):
    """The driver-resident MemoryStore raises (rather than silently
    growing toward an OOM) once its keyspace exceeds max_keys; the
    error points at ParquetChangelogStore as the scale path."""
    import pytest
    from pyspark.sql import Row

    from _kafka_streams_scaffold_spark.streaming import serving

    store = serving.MemoryStore(["k"], max_keys=2)
    ok = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    store.upsert_batch(ok, 0)
    # re-upserting existing keys stays within bounds
    store.upsert_batch(ok, 1)
    assert store.get("a") == {"k": "a", "v": 1}

    third = spark.createDataFrame([Row(k="c", v=3)])
    with pytest.raises(RuntimeError, match="ParquetChangelogStore"):
        store.upsert_batch(third, 2)
