"""Embedding quantization: symmetric per-vector int8 compression.

A 100 TB embedding corpus at float32 is 4 bytes/dim; serving and ANN
tiers ship int8 (scale + codes) for a 4x bandwidth/storage cut with
~0.3% cosine error. The standard symmetric scheme: per vector,
``scale = max|x| / 127``, ``q_i = round(x_i / scale)`` — and the
round is expressed as ``floor(v + 0.5)`` so both engines compute the
identical half-up semantics (Spark's ROUND and DuckDB's round differ
on ties; floor of the same correctly-rounded double does not).

Pure per-row expressions: no shuffle, no UDF, column-pruned scan —
the whole operator rides whole-stage codegen at any corpus size. The
error audit reduces per-element absolute errors through the module's
standard fixed-point contract (floor(1e9 x) -> BIGINT, exact sum) so
the corpus-level mean is order-independent and cross-engine exact.

North-star addition (no reference analog; the scaffold has no
vector surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables

_QMAX = 127

# max|x| as double; 0.0 only for the all-zero vector
_MAXABS = "array_max(transform(embedding, x -> abs(cast(x as double))))"

_Q_CODES = (
    f"case when {_MAXABS} = 0.0d then transform(embedding, x -> 0) "
    f"else transform(embedding, x -> cast(floor(cast(x as double) "
    f"/ {_MAXABS} * {_QMAX}.0d + 0.5d) as int)) end"
)


def embedding_quantize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, scale, q): per-vector symmetric int8 codes plus the
    dequantization scale. all-zero vectors quantize to zero codes with
    scale 0 (guarded — ANSI mode would otherwise abort on the
    divide). The codes ship as a comma-joined string (one scalar per
    vector) rather than ``array<int>``: downstream tabular consumers —
    including the driver's pandas canonicalizer — sort/hash scalar
    columns, and int→string rendering is exact and engine-agnostic, so
    nothing is lost by scalarizing at the boundary."""
    emb = tables.table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        (F.expr(_MAXABS) / F.lit(float(_QMAX))).alias("scale"),
        F.expr(
            f"array_join(transform({_Q_CODES}, c -> cast(c as string)), ',')"
        ).alias("q"),
    )


_DUCK_MAXABS = "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"

EMBEDDING_QUANTIZE_ORACLE = f"""
SELECT vec_id,
       {_DUCK_MAXABS} / {_QMAX}.0 AS scale,
       array_to_string(
         CASE WHEN {_DUCK_MAXABS} = 0.0
              THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
                   / {_DUCK_MAXABS} * {_QMAX}.0 + 0.5) AS INT)) END,
         ',') AS q
FROM embeddings
"""


_ERR_SCALE = 10**9


def quantization_error_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus audit: (n_vecs, n_elems, mean_abs_err) of int8
    reconstruction (q * scale vs original). ONE scan — quantize,
    dequantize, and error all evaluate per row in the same codegen
    stage (no self-join back to the corpus). Element errors are
    fixed-pointed before the sum so the reduction is an exact BIGINT
    aggregate — deterministic under any partitioning — with one
    correctly-rounded division at the end. Partial-aggregatable:
    map-side combine collapses each partition to three numbers."""
    emb = tables.table(spark, sf_dir, "embeddings")
    per_row = emb.select(
        F.size("embedding").alias("d"),
        F.expr(
            f"aggregate(zip_with(embedding, {_Q_CODES}, (x, c) -> "
            f"cast(floor(abs(cast(x as double) - c * ({_MAXABS} / {_QMAX}.0d)) "
            f"* {_ERR_SCALE}L) as bigint)), 0L, (acc, e) -> acc + e)"
        ).alias("efp"),
    )
    return per_row.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("d").alias("n_elems"),
        (
            F.sum("efp").cast("double")
            / (F.sum("d") * F.lit(_ERR_SCALE)).cast("double")
        ).alias("mean_abs_err"),
    )


# The DuckDB twin mirrors the one-pass shape: scale and codes are
# recomputed inline per row (list ops over the zipped pair list),
# then fixed-point errors sum exactly.
QUANTIZATION_ERROR_ORACLE = f"""
WITH per_row AS (
  SELECT len(embedding) AS d,
         list_sum(list_transform(
           list_zip(embedding,
                    CASE WHEN {_DUCK_MAXABS} = 0.0
                         THEN list_transform(embedding, x -> 0)
                         ELSE list_transform(embedding,
                              x -> CAST(floor(CAST(x AS DOUBLE)
                                   / {_DUCK_MAXABS} * {_QMAX}.0 + 0.5) AS INT))
                    END),
           p -> CAST(floor(abs(CAST(p[1] AS DOUBLE)
                    - p[2] * ({_DUCK_MAXABS} / {_QMAX}.0))
                    * {_ERR_SCALE}) AS BIGINT))) AS efp
  FROM embeddings
)
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(d) AS BIGINT) AS n_elems,
       CAST(sum(efp) AS DOUBLE) / CAST(sum(d) * {_ERR_SCALE} AS DOUBLE)
         AS mean_abs_err
FROM per_row
"""
