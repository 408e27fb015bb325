"""Round-5 late additions: sequence-gap audit, watermark lag audit,
bigram next-token model, compaction plan, join-key skew diagnostic."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import dq, layout, lm, skew


def _events(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=base + datetime.timedelta(seconds=s),
                user_id=u,
                event_type=t,
                value=1.0,
                props="{}",
            )
            for i, s, u, t in rows
        ]
    )


def test_sequence_gap_audit_counts_gaps_and_dups(spark, monkeypatch):
    # ids 0,1,2,2,5 -> range 0..5 (6 slots), 4 distinct -> 2 missing, 1 dup
    ev = _events(
        spark,
        [(0, 0, 1, "a"), (1, 1, 1, "a"), (2, 2, 1, "a"), (2, 3, 1, "a"), (5, 4, 1, "a")],
    )
    monkeypatch.setattr(dq.tables, "table", lambda *a: ev)
    r = dq.sequence_gap_audit_query(spark, "_").collect()[0]
    assert r["n_rows"] == 5 and r["min_id"] == 0 and r["max_id"] == 5
    assert r["n_missing"] == 2 and r["n_dup"] == 1


def test_sequence_gap_audit_clean_on_testdata(spark, sf_dir):
    r = dq.sequence_gap_audit_query(spark, sf_dir).collect()[0]
    assert r["n_dup"] == 0 and r["n_missing"] >= 0


def test_watermark_lag_audit(spark, monkeypatch):
    # arrival order (event_id): ts seconds 100, 40, 110, 50
    # running max: 100, 100, 110, 110 -> lateness 0, 60, 0, 60
    ev = _events(
        spark,
        [(0, 100, 1, "a"), (1, 40, 1, "a"), (2, 110, 1, "a"), (3, 50, 1, "a")],
    )
    monkeypatch.setattr(dq.tables, "table", lambda *a: ev)
    r = {
        x["event_type"]: x
        for x in dq.watermark_lag_audit_query(spark, "_").collect()
    }["a"]
    assert r["n_events"] == 4 and r["n_late"] == 2
    assert r["max_late_s"] == 60 and abs(r["avg_late_s"] - 60.0) < 1e-12


def test_watermark_lag_audit_in_order_stream(spark, monkeypatch):
    ev = _events(spark, [(i, i * 10, 1, "a") for i in range(5)])
    monkeypatch.setattr(dq.tables, "table", lambda *a: ev)
    r = dq.watermark_lag_audit_query(spark, "_").collect()[0]
    assert r["n_late"] == 0 and r["max_late_s"] == 0
    assert r["avg_late_s"] is None


def _docs(spark, texts):
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
            for i, t in enumerate(texts)
        ]
    )


def test_bigram_next_token_argmax_and_floor(spark, monkeypatch):
    monkeypatch.setattr(lm.tables, "table", lambda *a: _docs(
        spark, ["a b a b a c"] * 3  # bigrams per doc: ab, ba, ab, ba, ac
    ))
    monkeypatch.setattr(lm, "BIGRAM_MIN_COUNT", 5)
    rows = {r["token"]: r for r in lm.bigram_next_token_query(spark, "_").collect()}
    # token 'a': 9 outgoing (ab x6, ac x3) -> argmax 'b'
    assert rows["a"]["next_token"] == "b"
    assert rows["a"]["pair_n"] == 6 and rows["a"]["token_n"] == 9
    # token 'b': 6 outgoing (ba x6) -> 'a'
    assert rows["b"]["next_token"] == "a" and rows["b"]["token_n"] == 6
    # token 'c': only 0 outgoing (doc-final) -> absent entirely
    assert "c" not in rows


def test_bigram_next_token_tie_breaks_lexicographically(spark, monkeypatch):
    monkeypatch.setattr(lm.tables, "table", lambda *a: _docs(
        spark, ["x b", "x a"] * 3
    ))
    monkeypatch.setattr(lm, "BIGRAM_MIN_COUNT", 1)
    rows = {r["token"]: r for r in lm.bigram_next_token_query(spark, "_").collect()}
    assert rows["x"]["next_token"] == "a"  # 3 vs 3, 'a' < 'b'


def test_compaction_plan_ceil_math(spark, monkeypatch):
    target = layout.COMPACTION_TARGET_CHARS
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="x", lang="en", source="big", n_chars=target * 2 + 1),
            Row(doc_id=1, text="x", lang="en", source="big", n_chars=1),
            Row(doc_id=2, text="x", lang="en", source="small", n_chars=10),
        ]
    )
    monkeypatch.setattr(layout.tables, "table", lambda *a: docs)
    rows = {r["source"]: r for r in layout.compaction_plan_query(spark, "_").collect()}
    big = rows["big"]
    assert big["total_chars"] == target * 2 + 2
    assert big["target_files"] == 3  # ceil((2T+2)/T)
    assert big["docs_per_file"] == 1  # ceil(2/3)
    small = rows["small"]
    assert small["target_files"] == 1 and small["docs_per_file"] == 1


def test_join_key_skew_flags_hot_key(spark, monkeypatch):
    rows = [Row(l_orderkey=i, l_partkey=777, l_suppkey=1, l_linenumber=1,
                l_quantity=1.0, l_extendedprice=1.0, l_discount=0.0,
                l_tax=0.0, l_returnflag="N", l_linestatus="O",
                l_shipdate=datetime.datetime(2024, 1, 1))
            for i in range(90)]
    rows += [Row(l_orderkey=100 + k, l_partkey=k, l_suppkey=1, l_linenumber=1,
                 l_quantity=1.0, l_extendedprice=1.0, l_discount=0.0,
                 l_tax=0.0, l_returnflag="N", l_linestatus="O",
                 l_shipdate=datetime.datetime(2024, 1, 1))
             for k in range(10)]
    monkeypatch.setattr(skew.tables, "table", lambda *a: spark.createDataFrame(rows))
    out = skew.join_key_skew_query(spark, "_").collect()
    assert len(out) == skew.SKEW_TOP_K
    top = max(out, key=lambda r: r["cnt"])
    assert top["l_partkey"] == 777 and top["cnt"] == 90
    assert top["total_rows"] == 100 and top["n_keys"] == 11
    # skew ratio 90*11/100 = 9.9x the mean key load
    assert top["ratio_num"] == 990 and top["ratio_den"] == 100
