"""Range-join and chunking tests: boundary semantics on crafted frames
plus the no-cartesian plan contract for the bucketized interval join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from _kafka_streams_scaffold_spark import plans
from _kafka_streams_scaffold_spark.operators import rangejoin, textops


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _ev(eid, user, ts, typ):
    return Row(event_id=eid, user_id=user, ts=_ts(ts), event_type=typ)


def test_prior_clicks_equi_range_golden(spark, sf_dir, monkeypatch):
    rows = [
        _ev(1, 1, "2024-01-01T10:00:00", "error"),
        _ev(2, 1, "2024-01-01T09:51:00", "click"),   # inside 10-min lookback
        _ev(3, 1, "2024-01-01T09:49:59", "click"),   # too early
        _ev(4, 1, "2024-01-01T10:00:00", "click"),   # not strictly before
        _ev(5, 2, "2024-01-01T09:55:00", "click"),   # other user
        _ev(6, 2, "2024-01-01T12:00:00", "error"),   # no clicks at all
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(rangejoin.tables, "table", lambda *a: df)
    got = {
        r["event_id"]: r["n_prior_clicks"]
        for r in rangejoin.prior_clicks_before_error_query(spark, sf_dir).collect()
    }
    assert got == {1: 1, 6: 0}


def test_error_window_bucketized_golden(spark, sf_dir, monkeypatch):
    rows = [
        # window [10:50, 11:05) crosses an hour-bucket boundary
        _ev(1, 1, "2024-01-01T10:50:00", "error"),
        _ev(2, 2, "2024-01-01T10:59:00", "view"),    # in, bucket 10:00
        _ev(3, 3, "2024-01-01T11:04:59", "click"),   # in, bucket 11:00
        _ev(4, 4, "2024-01-01T11:05:00", "click"),   # exactly at end: out
        _ev(5, 5, "2024-01-01T10:49:59", "view"),    # before start: out
        # window fully inside one hour (array_distinct path: must not
        # double-count through duplicate buckets)
        _ev(6, 1, "2024-01-01T14:10:00", "error"),
        _ev(7, 2, "2024-01-01T14:20:00", "view"),    # in
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(rangejoin.tables, "table", lambda *a: df)
    got = {
        r["event_id"]: r["n_events"]
        for r in rangejoin.error_window_counts_query(spark, sf_dir).collect()
    }
    # each error counts itself plus the in-window events
    assert got == {1: 3, 6: 2}


def test_error_window_plan_no_cartesian(spark, sf_dir):
    explained = plans.explain_str(
        rangejoin.error_window_counts_query(spark, sf_dir)
    )
    assert "CartesianProduct" not in explained
    assert "BroadcastNestedLoopJoin" not in explained


def test_doc_chunks_golden(spark, sf_dir, monkeypatch):
    words = " ".join(f"w{i}" for i in range(95))  # 95 tokens
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=words),
            Row(doc_id=2, text="only three tokens"),
            Row(doc_id=3, text="   "),  # tokenizes to nothing -> dropped
        ]
    )
    monkeypatch.setattr(textops.tables, "table", lambda *a: docs)
    monkeypatch.setattr(textops.tables, "spread", lambda df, *a, **k: df)
    rows = textops.doc_chunks_query(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    # doc 1: starts at 0, 40, 80 -> sizes 50, 50, 15
    assert [by_doc[1][i]["n_tokens"] for i in (0, 1, 2)] == [50, 50, 15]
    # stride-40 overlap: chunk 1 starts at token 40
    assert by_doc[1][1]["chunk_text"].split(" ")[0] == "w40"
    assert by_doc[1][2]["chunk_text"].split(" ")[-1] == "w94"
    # doc 2: a single short chunk; doc 3 absent
    assert by_doc[2][0]["n_tokens"] == 3
    assert 3 not in by_doc


def test_chunk_packing_golden(spark, sf_dir, monkeypatch):
    # 3 docs in one source shard; 95-token docs chunk to 50/45; budget
    # 256 -> bins fill contiguously in (doc_id, chunk_idx) order
    words = " ".join(f"w{i}" for i in range(95))
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=words, source="s0") for i in (1, 2, 3)]
    )
    monkeypatch.setattr(textops.tables, "table", lambda *a: docs)
    monkeypatch.setattr(textops.tables, "spread", lambda df, *a, **k: df)
    rows = textops.chunk_packing_query(spark, sf_dir).collect()
    # chunks in order: sizes 50,50,15 per doc; exclusive cumsum div 256
    sizes = [50, 50, 15] * 3
    cum = 0
    expect = []
    for s in sizes:
        expect.append(cum // 256)
        cum += s
    got = [
        r["bin_id"]
        for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"]))
    ]
    assert got == expect
    assert max(got) == 1  # 345 total tokens -> 2 bins
