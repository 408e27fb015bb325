"""Python UDTF surface: lateral expansion parity with the SQL form."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark.functions import udtf_ops


def test_udtf_matches_sql_expression(spark, sf_dir):
    """The UDTF path must be row-for-row equal to the pure-SQL
    posexplode/split/filter expression — escape hatch, not a fork."""
    udtf_ops.register_udtfs(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    docs.createOrReplaceTempView("udtf_docs")

    via_udtf = spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_words
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
        """
    ).collect()

    min_c = udtf_ops.MIN_SENTENCE_CHARS
    via_sql = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "filter(transform(split(text, '\\\\.'), x -> trim(x)),"
                    f" x -> length(x) >= {min_c})"
                )
            ).alias("sentence_idx", "sentence"),
        )
        .withColumn("n_words", F.size(F.split("sentence", " ")))
        .collect()
    )
    key = lambda r: (r["doc_id"], r["sentence_idx"])  # noqa: E731
    a = sorted(((r["doc_id"], r["sentence_idx"], r["sentence"], r["n_words"]) for r in via_udtf))
    b = sorted(((r["doc_id"], r["sentence_idx"], r["sentence"], r["n_words"]) for r in via_sql))
    assert a == b and a


def test_udtf_handles_null_and_short_text(spark):
    udtf_ops.register_udtfs(spark)
    df = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="tiny. ok?")]
    )
    df.createOrReplaceTempView("udtf_edge")
    rows = spark.sql(
        "SELECT d.doc_id, s.* FROM udtf_edge d,"
        " LATERAL split_sentences(d.text) s"
    ).collect()
    # NULL text -> no rows; all fragments under MIN_CHARS -> no rows
    assert rows == []
