"""Small-file compaction: layout changes, data does not."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark.sources import compaction


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    # simulate a streaming sink's droppings: 40 tiny files
    for i in range(10):
        spark.range(i * 100, (i + 1) * 100).withColumn(
            "v", F.col("id") * 2
        ).repartition(4).write.mode("append").parquet(path)
    before = compaction.table_file_stats(spark, path)
    assert before["n_files"] >= 40
    rows_before = sorted(
        (r["id"], r["v"]) for r in spark.read.parquet(path).collect()
    )

    out = compaction.compact_table(spark, path, target_bytes=1 << 30)
    assert out["after"]["n_files"] == 1  # tiny table -> one file
    rows_after = sorted(
        (r["id"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    assert rows_after == rows_before
    assert out["after"]["total_bytes"] < before["total_bytes"], (
        "fewer files also means less footer/overhead bytes"
    )


def test_compaction_respects_target_size(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.range(200_000).withColumn("v", F.rand(7)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    total = compaction.table_file_stats(spark, path)["total_bytes"]
    target = total // 4 + 1
    out = compaction.compact_table(spark, path, target_bytes=target)
    # ceil(total/target) ~ 4 output files (parquet size variance ±1)
    assert 3 <= out["after"]["n_files"] <= 5
    assert spark.read.parquet(path).count() == 200_000
