"""Ingestion formats: corrupt-record quarantine + ORC parity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark.plans import inspect as pi
from _kafka_streams_scaffold_spark.sources import ingest


def test_jsonl_quarantine_keeps_bad_rows(spark, tmp_path):
    src = str(tmp_path / "in.jsonl")
    with open(src, "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write("this is not json at all\n")
        f.write('{"doc_id": "NaNope", "text": "bad type"}\n')
        f.write('{"doc_id": 2, "text": "also ok"}\n')
    df = ingest.read_jsonl(spark, src, "doc_id long, text string")
    clean, bad = ingest.split_quarantine(df)
    assert {(r["doc_id"], r["text"]) for r in clean.collect()} == {
        (1, "ok"),
        (2, "also ok"),
    }
    raws = [r["raw_record"] for r in bad.collect()]
    assert len(raws) == 2
    assert any("not json" in r for r in raws)
    assert any("NaNope" in r for r in raws), (
        "type-mismatched rows must quarantine with their raw text"
    )


def test_csv_quarantine(spark, tmp_path):
    src = str(tmp_path / "in.csv")
    with open(src, "w") as f:
        f.write("doc_id,n\n")
        f.write("1,10\n")
        f.write("2,notanumber\n")
        f.write("3,30\n")
    df = ingest.read_csv(spark, src, "doc_id long, n long")
    clean, bad = ingest.split_quarantine(df)
    assert {(r["doc_id"], r["n"]) for r in clean.collect()} == {
        (1, 10),
        (3, 30),
    }
    assert bad.count() == 1


def test_orc_round_trip_with_pushdown(spark, tmp_path, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_orc")
    ingest.write_orc(orders, path)
    back = ingest.read_orc(spark, path)
    assert back.count() == orders.count()
    # same bytes through either format
    a = orders.agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
    ).collect()[0][0]
    b = back.agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
    ).collect()[0][0]
    assert a == b
    # predicate pushdown + column pruning reach the ORC scan too
    q = back.filter(F.col("o_orderkey") == 42).select("o_totalprice")
    plan = pi.explain_str(q)
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]" in plan
    assert "o_comment" not in plan.split("ReadSchema")[1][:400]
