"""Corpus curation capstone: the keep/drop decision a training-data
pipeline actually ships, composed from the engine's own operators —
quality scoring, language ID, exact-dedup canonicalization, and
benchmark decontamination — in ONE declarative plan.

Composition is the point: each input is the same DataFrame function
registered individually (textops.quality_score / lang_id,
dedup.exact_dedup / contamination), so this query demonstrates that
operators chain without materialization boundaries; Catalyst sees one
tree and shares the document scan where it can. The DuckDB oracle
composes the same logic as CTEs — the full pipeline is hash-checked
end to end, not just its parts.

Scale: quality/lang/fingerprint are scan-local (no shuffle); the
dedup-rep join shuffles 16-byte digests; contamination joins against
a broadcast benchmark shingle set. The widest thing that ever
shuffles is (doc_id, digest) — never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import BENCHMARK_DOC_MAX, contamination_query, exact_dedup_query
from .textops import (
    fingerprint_query,
    lang_id_query,
    quality_score_query,
)

MIN_QUALITY = 0.5
KEEP_LANG = "en"
MAX_CONTAMINATED_SHINGLES = 2


def corpus_keep_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    quality = quality_score_query(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    lang = lang_id_query(spark, sf_dir).select("doc_id", "pred_lang")
    fps = fingerprint_query(spark, sf_dir)
    reps = exact_dedup_query(spark, sf_dir).select("fingerprint", "rep_doc_id")
    canonical = fps.join(reps, "fingerprint").select(
        "doc_id", (F.col("doc_id") == F.col("rep_doc_id")).alias("is_canonical")
    )
    contam = contamination_query(spark, sf_dir)

    keep = (
        (F.col("quality_score") >= MIN_QUALITY)
        & (F.col("pred_lang") == KEEP_LANG)
        & F.col("is_canonical")
        & (F.col("n_contaminated_shingles") <= MAX_CONTAMINATED_SHINGLES)
        & (F.col("doc_id") >= BENCHMARK_DOC_MAX)
    )
    return (
        quality.join(lang, "doc_id")
        .join(canonical, "doc_id")
        .join(contam, "doc_id", "left")
        .na.fill({"n_contaminated_shingles": 0})
        .select(
            "doc_id",
            "quality_score",
            "pred_lang",
            "is_canonical",
            "n_contaminated_shingles",
            keep.alias("keep"),
        )
    )


def _cte(sql: str) -> str:
    return sql.strip().rstrip(";")


def _build_oracle() -> str:
    from .dedup import CONTAMINATION_ORACLE, EXACT_DEDUP_ORACLE
    from .textops import (
        FINGERPRINT_ORACLE,
        LANG_ID_ORACLE,
        QUALITY_SCORE_ORACLE,
    )

    return f"""
WITH quality AS ({_cte(QUALITY_SCORE_ORACLE)}),
lang AS ({_cte(LANG_ID_ORACLE)}),
fps AS ({_cte(FINGERPRINT_ORACLE)}),
reps AS ({_cte(EXACT_DEDUP_ORACLE)}),
contam AS ({_cte(CONTAMINATION_ORACLE)}),
canonical AS (
  SELECT fps.doc_id, fps.doc_id = reps.rep_doc_id AS is_canonical
  FROM fps JOIN reps ON fps.fingerprint = reps.fingerprint
)
SELECT q.doc_id, q.quality_score, l.pred_lang, c.is_canonical,
       COALESCE(ct.n_contaminated_shingles, 0) AS n_contaminated_shingles,
       q.quality_score >= {MIN_QUALITY}
         AND l.pred_lang = '{KEEP_LANG}'
         AND c.is_canonical
         AND COALESCE(ct.n_contaminated_shingles, 0)
             <= {MAX_CONTAMINATED_SHINGLES}
         AND q.doc_id >= {BENCHMARK_DOC_MAX} AS keep
FROM quality q
JOIN lang l ON l.doc_id = q.doc_id
JOIN canonical c ON c.doc_id = q.doc_id
LEFT JOIN contam ct ON ct.doc_id = q.doc_id
"""


CORPUS_KEEP_ORACLE = _build_oracle()
