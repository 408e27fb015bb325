"""WordCount golden tests mirroring the reference's own assertions
(``WordCountTopologyTest.java:42-53``: 'list' counts 3 then 4;
``WordCountServiceTests.java:59-87``: incremental 'fox' counts)."""

from __future__ import annotations

from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import wordcount


def _counts(spark, lines):
    df = spark.createDataFrame([Row(text=s) for s in lines])
    return {r["word"]: r["cnt"] for r in wordcount.wordcount(df).collect()}


def test_reference_golden_list_count(spark):
    lines = [
        "A property list can contain another property list as",
        "A property list can contain another property list as",
    ]
    assert _counts(spark, lines)["list"] == 4
    lines.append("the list")
    assert _counts(spark, lines)["list"] == 5


def test_reference_golden_fox(spark):
    line = "the quick brown fox jumps over the lazy dog"
    assert _counts(spark, [line])["fox"] == 1
    assert _counts(spark, [line] * 3)["fox"] == 3
    assert _counts(spark, [line])["the"] == 2


def test_split_edge_cases(spark):
    # Leading punctuation produces a leading empty token in Java's split;
    # both it and interior empties must be dropped.
    counts = _counts(spark, ["...Hello, WORLD!  hello"])
    assert counts == {"hello": 2, "world": 1}


def test_point_lookup(spark, sf_dir):
    df = wordcount.point_lookup_query(spark, sf_dir, word="spark")
    rows = df.collect()
    assert len(rows) <= 1
    if rows:
        assert rows[0]["word"] == "spark" and rows[0]["cnt"] > 0


def test_wordcount_on_documents(spark, sf_dir):
    df = wordcount.wordcount_query(spark, sf_dir)
    assert df.columns == ["word", "cnt"]
    assert df.count() > 0
