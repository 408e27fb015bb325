"""Write-Audit-Publish: red audits never touch the live table."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark.sources import wap


def test_green_audit_publishes(spark, tmp_path):
    path = str(tmp_path / "t")
    v1 = spark.range(100).withColumn("k", F.col("id") % 10)
    out = wap.wap_publish(
        spark,
        v1,
        path,
        [("min_rows", wap.min_rows(50)), ("keys", wap.no_nulls("k"))],
    )
    assert out["published"]
    assert spark.read.parquet(path).count() == 100


def test_red_audit_keeps_live_table_and_staging(spark, tmp_path):
    path = str(tmp_path / "t")
    wap.wap_publish(spark, spark.range(100), path, [("f", wap.min_rows(1))])
    # a truncated v2 must be rejected by the shrink tripwire
    v2 = spark.range(10)
    with pytest.raises(wap.AuditFailure) as ei:
        wap.wap_publish(
            spark,
            v2,
            path,
            [("shrink", wap.max_shrink(path, 0.5))],
        )
    # live table untouched
    assert spark.read.parquet(path).count() == 100
    # staged evidence preserved for inspection
    assert os.path.exists(ei.value.staged)
    assert spark.read.parquet(ei.value.staged).count() == 10


def test_audits_run_against_staged_files(spark, tmp_path):
    """The audit must see what will be published (the staged files),
    not the input plan — a nondeterministic source would otherwise
    publish something other than what was audited."""
    path = str(tmp_path / "t")
    seen = {}

    def capture(spark_, df):
        seen["files"] = df.inputFiles()
        return True, "ok"

    wap.wap_publish(spark, spark.range(5), path, [("cap", capture)])
    assert seen["files"], "audit should have read staged files"
    assert all("wap-staged-" in f for f in seen["files"])
