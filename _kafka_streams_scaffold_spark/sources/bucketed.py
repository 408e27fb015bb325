"""Bucketed-table storage: the shuffle-free co-located join.

At 100 TB the single most expensive physical operation is shuffling a
fact table for a join. Spark's bucketed tables (Hive-compatible
bucketing: ``write.bucketBy(n, key).sortBy(key).saveAsTable``) fix
the partitioning AT WRITE TIME — every bucket file holds one
hash-slice of the key space — so a join between two tables bucketed
on the same key with the same bucket count needs NO Exchange on
either side: each task zips matching bucket files (and with sortBy
metadata, no Sort either). The price is paid once at layout time and
amortized over every subsequent join/aggregation on that key — the
same trade the reference's Kafka Streams co-partitioned topics make
(`PurchasesTopology.java` relies on key-partitioned topics the same
way), re-expressed in Spark's storage layer.

Contract notes encoded here and asserted in tests/test_bucketed.py:
- both sides must share bucket COUNT and bucket KEY, or Spark
  silently falls back to shuffling the mismatched side;
- ``spark.sql.sources.bucketing.enabled`` (default true) and
  ``autoBroadcastJoinThreshold`` interact: a broadcastable dim still
  broadcasts (cheaper than even a zero-shuffle SMJ for small sides);
- bucket pruning: an equality filter on the bucket key scans 1/n of
  the files (`spark.sql.sources.bucketing.autoBucketedScan.enabled`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed (and optionally sort-within-
    bucket) managed table. Overwrites an existing table of the same
    name — layout jobs are idempotent re-runs."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-key same-count bucketed tables — plans with zero
    Exchange under the bucketing contract (asserted in tests)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key)
