"""Deterministic sampling & dataset splitting for training pipelines.

``df.sample()`` is seed-and-partitioning dependent — rerun the job
with different parallelism and the sample changes. Training-data
pipelines need *content-stable* sampling: whether a row is in the
sample depends only on the row's key. The standard trick is a hash
bucket: ``md5(key) mod 100`` gives a uniform, engine-independent
percentile; splits and samples are then WHERE clauses, fully
pushdown-friendly, reproducible across engines, clusters, and reruns,
and stable under data growth (a doc's split never changes when other
docs are added).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables

TRAIN_PCT = 80
VAL_PCT = 10  # test = remainder
SAMPLE_PCT = 10

_BUCKET_SPARK = (
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint) % 100"
)
_BUCKET_DUCK = (
    "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100"
)


def with_bucket(docs: DataFrame) -> DataFrame:
    return docs.withColumn("bucket", F.expr(_BUCKET_SPARK))


def dataset_split_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to train/val/test by hash bucket
    (80/10/10). Pure per-row expression: no shuffle, no state, scans
    at parquet speed at any SF."""
    docs = tables.table(spark, sf_dir, "documents")
    b = F.col("bucket")
    split = (
        F.when(b < TRAIN_PCT, "train")
        .when(b < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    return with_bucket(docs).select(
        "doc_id", "source", "bucket", split.alias("split")
    )


DATASET_SPLIT_ORACLE = f"""
SELECT doc_id, source, bucket,
       CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
            WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, source, {_BUCKET_DUCK} AS bucket FROM documents)
"""


def stratified_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% sample per source stratum via the same hash bucket. The
    WHERE is a plain predicate, so at scale it rides the scan (no
    sample() RNG, no repartition); per-stratum counts verify the
    rate."""
    docs = tables.table(spark, sf_dir, "documents")
    sampled = with_bucket(docs).filter(F.col("bucket") < SAMPLE_PCT)
    return (
        sampled.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


STRATIFIED_SAMPLE_ORACLE = f"""
SELECT source, count(*) AS n_sampled,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM (SELECT doc_id, source, {_BUCKET_DUCK} AS bucket FROM documents)
WHERE bucket < {SAMPLE_PCT}
GROUP BY source
"""
