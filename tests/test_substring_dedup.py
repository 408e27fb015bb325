"""Tests for exact-substring duplicate detection."""

from __future__ import annotations

from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import substring_dedup as sd

SPAN = "this exact span is pasted verbatim into both documents"  # 54 chars


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_planted_verbatim_span_is_detected(spark, monkeypatch):
    df = _docs(
        spark,
        [
            "intro words before " + SPAN + " and a unique tail here",
            "different opening text " + SPAN + " with another ending",
            "a completely unrelated document about spark shuffle plans",
        ],
    )
    monkeypatch.setattr(sd.tables, "table", lambda *a: df)
    flagged = {
        r["doc_id"]: r["n_shared_windows"]
        for r in sd.substring_dup_docs_query(spark, "_").collect()
    }
    assert set(flagged) == {0, 1}
    # a shared span of length L yields L - W + 1 shared windows; the
    # shared span here is " " + SPAN + " " (both docs flank it with
    # spaces)
    expected = (len(SPAN) + 2) - sd.WINDOW_CHARS + 1
    assert flagged[0] == expected
    assert flagged[1] == expected


def test_short_overlap_below_window_is_ignored(spark, monkeypatch):
    short = "shared bit"  # < WINDOW_CHARS, must not trigger
    df = _docs(
        spark,
        [
            "first document mentions the " + short + " only briefly okay",
            "second one also has the " + short + " but nothing longer!!",
        ],
    )
    monkeypatch.setattr(sd.tables, "table", lambda *a: df)
    shared = sd.shared_substrings_query(spark, "_").collect()
    # sanity: any flagged window must actually be a real cross-doc span
    texts = [r["text"].lower() for r in df.collect()]
    for r in shared:
        assert all(r["w"] in t for t in texts[:2]) or r["n_docs"] < 2


def test_within_doc_repeat_counts_once(spark, monkeypatch):
    span = "x" * sd.WINDOW_CHARS
    df = _docs(
        spark,
        [
            span + " middle filler words " + span,  # repeated inside ONE doc
            "totally different second document with no overlap at all",
        ],
    )
    monkeypatch.setattr(sd.tables, "table", lambda *a: df)
    shared = {
        r["w"]: r["n_docs"]
        for r in sd.shared_substrings_query(spark, "_").collect()
    }
    # the all-x window appears twice in doc 0 but in no other doc
    assert span not in shared


def test_doc_ngram_novelty_first_doc_wins(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta"
    df = _docs(
        spark,
        [
            base,                       # doc 0: all shingles novel
            base,                       # doc 1: exact copy -> novelty 0
            base + " eta theta iota",   # doc 2: suffix shingles novel
        ],
    )
    monkeypatch.setattr(dedup.tables, "table", lambda *a: df)
    rows = {
        r["doc_id"]: r for r in dedup.doc_ngram_novelty_query(spark, "_").collect()
    }
    assert rows[0]["novelty"] == 1.0
    assert rows[1]["novelty"] == 0.0
    # doc 2 shares the 4 shingles of `base` and adds 3+2 new trailing
    # shingles ("epsilon zeta eta", "zeta eta theta", "eta theta iota")
    assert rows[2]["n_novel"] == 3
    assert 0.0 < rows[2]["novelty"] < 1.0


def test_incremental_dedup_probes_corpus_index(spark, monkeypatch):
    """doc 0 hashes into the incoming split (md5 bucket >= 90), docs
    1-3 into the standing corpus; the incoming near-copy must flag its
    corpus twin, and corpus-corpus duplicates must NOT appear."""
    from _kafka_streams_scaffold_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base.replace("today", "tomorrow")),  # incoming near-dup of 1
        (1, base),                               # corpus original
        (2, base),                               # corpus exact dup of 1
        (3, "completely different text about spark shuffles and joins"),
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows]
    )
    monkeypatch.setattr(dedup.tables, "table", lambda *a: df)
    got = {r["doc_id"]: r for r in dedup.incremental_dedup_query(spark, "_").collect()}
    assert set(got) == {0}                 # only the incoming doc reports
    assert got[0]["n_corpus_dups"] == 2    # matches both corpus copies
    assert got[0]["best_match"] == 1
    assert got[0]["min_hamming"] <= dedup.HAMMING_THRESHOLD
