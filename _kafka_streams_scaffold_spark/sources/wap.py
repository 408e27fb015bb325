"""Write-Audit-Publish: the gated-publish pattern for curated tables.

A 100 TB pipeline never overwrites a consumed table in place: it
writes the new version to a STAGING location, runs audits against the
staged data (row-count deltas, constraint checks, referential
integrity — any callable verdict), and only a fully-green audit swaps
the staged version in. A red audit leaves the live table untouched
and the staging directory intact for inspection — failed data is
evidence, not garbage. This is the WAP workflow Netflix popularized
on Iceberg branches; on plain parquet directories the atomic unit is
the directory swap (same crash-safe staging as
``compaction.compact_table``).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Audit = Callable[[SparkSession, DataFrame], tuple[bool, str]]


class AuditFailure(RuntimeError):
    """Raised when any audit rejects the staged data; carries the
    staging path so the failure can be inspected."""

    def __init__(self, verdicts: list[tuple[str, bool, str]], staged: str):
        self.verdicts = verdicts
        self.staged = staged
        failed = [f"{name}: {msg}" for name, ok, msg in verdicts if not ok]
        super().__init__(
            f"audit failed ({len(failed)} red): " + "; ".join(failed)
            + f" — staged data kept at {staged}"
        )


def min_rows(n: int) -> Audit:
    def audit(spark: SparkSession, df: DataFrame) -> tuple[bool, str]:
        c = df.count()
        return c >= n, f"rows={c} (floor {n})"

    return audit


def max_shrink(spark_old_path: str, frac: float) -> Audit:
    """Reject a version that lost more than ``frac`` of the previous
    version's rows — the classic upstream-truncation tripwire."""

    def audit(spark: SparkSession, df: DataFrame) -> tuple[bool, str]:
        if not os.path.exists(spark_old_path):
            return True, "no previous version"
        old = spark.read.parquet(spark_old_path).count()
        new = df.count()
        ok = new >= (1.0 - frac) * old
        return ok, f"rows {old} -> {new} (floor {1.0 - frac:.0%})"

    return audit


def no_nulls(*cols: str) -> Audit:
    def audit(spark: SparkSession, df: DataFrame) -> tuple[bool, str]:
        from pyspark.sql import functions as F

        bad = df.filter(
            None
            if not cols
            else __import__("functools").reduce(
                lambda a, b: a | b, [F.col(c).isNull() for c in cols]
            )
        ).count()
        return bad == 0, f"null-keyed rows={bad}"

    return audit


def wap_publish(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    audits: list[tuple[str, Audit]],
) -> dict:
    """Stage ``df``, run every audit against the STAGED files (what
    will actually be published, not the logical plan), swap on green.
    Returns the verdict list; raises AuditFailure (staging preserved)
    on any red."""
    staged = tempfile.mkdtemp(prefix="wap-staged-")
    df.write.mode("overwrite").parquet(staged)
    staged_df = spark.read.parquet(staged)
    verdicts = [
        (name, *audit(spark, staged_df)) for name, audit in audits
    ]
    if not all(ok for _, ok, _ in verdicts):
        raise AuditFailure(verdicts, staged)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(staged, path)
    return {"published": True, "verdicts": verdicts}
