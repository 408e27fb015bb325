"""Tests for the round-2 corpus-curation additions: Gopher-style
quality gate, n-gram repetition, mixture sampling, per-source caps,
and embedding outlier scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from _kafka_streams_scaffold_spark import plans
from _kafka_streams_scaffold_spark.operators import sampling, similarity, textops


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


# -- gopher_quality ---------------------------------------------------------


def test_gopher_quality_signals_and_keep_rule(spark, monkeypatch):
    wordy = " ".join(f"word{i}" for i in range(30))          # all distinct
    loopy = " ".join(["spam"] * 30)                          # one word repeated
    short = "tiny doc"                                       # under min words
    df = _docs(spark, [wordy, loopy, short])
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    got = {r["doc_id"]: r for r in
           textops.gopher_quality_query(spark, "_").collect()}

    assert got[0]["n_words"] == 30
    assert got[0]["dup_word_frac"] == pytest.approx(0.0)
    assert got[0]["gopher_keep"] is True

    assert got[1]["n_distinct_words"] == 1
    assert got[1]["dup_word_frac"] == pytest.approx(29 / 30)
    assert got[1]["gopher_keep"] is False                    # too repetitive

    assert got[2]["n_words"] == 2
    assert got[2]["gopher_keep"] is False                    # too short


def test_gopher_quality_is_shuffle_free(spark, sf_dir):
    df = textops.gopher_quality_query(spark, sf_dir)
    # map-local signal extraction: the only allowed Exchange is the
    # explicit small-file spread() (REPARTITION_BY_NUM); Catalyst must
    # not need any shuffle of its own (ENSURE_REQUIREMENTS = an
    # aggregate/join/window needed co-location)
    assert "ENSURE_REQUIREMENTS" not in plans.explain_str(df)


# -- doc_repetition ---------------------------------------------------------


def test_doc_repetition_top_bigram(spark, monkeypatch):
    # "a b" appears 3x (positions 0,2,4 overlapping chain a b a b a b a),
    # total bigrams = 6
    rep = "a b a b a b a"
    flat = "one two three four"
    df = _docs(spark, [rep, flat])
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    got = {r["doc_id"]: r for r in
           textops.doc_repetition_query(spark, "_").collect()}
    assert got[0]["top_bigram"] == "a b"
    assert got[0]["top_count"] == 3
    assert got[0]["n_bigrams"] == 6
    assert got[0]["top_bigram_frac"] == pytest.approx(0.5)
    # all-distinct bigrams: every count is 1, tie resolves to the
    # lexicographically smallest bigram
    assert got[1]["top_count"] == 1
    assert got[1]["top_bigram"] == min(["one two", "two three", "three four"])


def test_doc_repetition_single_token_doc_drops_out(spark, monkeypatch):
    df = _docs(spark, ["loneword", "two words"])
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    got = {r["doc_id"] for r in
           textops.doc_repetition_query(spark, "_").collect()}
    assert got == {1}


# -- mixture_sample / source_cap --------------------------------------------


def test_mixture_sample_rates_and_nesting(spark, sf_dir):
    rows = sampling.mixture_sample_query(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
        assert r["bucket"] < r["rate_pct"]
    # src0 keeps everything (rate 100): 25 docs per source at sf0.001
    assert len(by_src.get("src0", ())) == 25
    # nested buckets: a lower-rate source's sample is a subset of what
    # it would keep at a higher rate (verified via the bucket rule)
    assert all(len(v) <= 25 for v in by_src.values())


def test_source_cap_keeps_top_n_per_source(spark, monkeypatch):
    df = spark.createDataFrame(
        [Row(doc_id=i, source="s0" if i < 20 else "s1", n_chars=1000 - i)
         for i in range(30)]
    )
    monkeypatch.setattr(sampling.tables, "table", lambda *a: df)
    rows = sampling.source_cap_query(spark, "_").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["s0"]) == sampling.SOURCE_CAP       # capped at 15
    assert len(by_src["s1"]) == 10                        # under the cap
    # kept docs are the longest ones (n_chars descending from doc 0)
    assert {r["doc_id"] for r in by_src["s0"]} == set(range(15))


def test_source_cap_plan_prunes_before_shuffle(spark, sf_dir):
    df = sampling.source_cap_query(spark, sf_dir)
    # rank<=N compiles to WindowGroupLimit: map-side top-N per key
    # before the exchange, so hot sources never materialize fully
    assert "WindowGroupLimit" in plans.explain_str(df)


# -- embedding_outliers -----------------------------------------------------


def test_embedding_outliers_flags_far_vector(spark, sf_dir):
    rows = similarity.embedding_outliers_query(spark, sf_dir).collect()
    assert len(rows) > 0
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["assigned_label"], []).append(r)
    for cell, members in by_cell.items():
        # ranks are a permutation of 1..n within each cell
        assert sorted(m["dist_rank"] for m in members) == list(
            range(1, len(members) + 1)
        )
        # the flag is exactly the documented rule
        for m in members:
            assert m["is_outlier"] == (
                m["dist2"] > similarity.OUTLIER_RATIO * m["mean_dist2"]
            )
        # mean consistency: every member shares the cell mean
        assert len({round(m["mean_dist2"], 9) for m in members}) == 1


# -- vocab_coverage ---------------------------------------------------------


def test_vocab_coverage_curve(spark, monkeypatch):
    # 4x "a", 2x "b", 1x "c" -> coverage 4/7, 6/7, 7/7
    df = _docs(spark, ["a a a a", "b b c"])
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    rows = sorted(
        textops.vocab_coverage_query(spark, "_").collect(),
        key=lambda r: r["vocab_rank"],
    )
    assert [(r["token"], r["cnt"], r["vocab_rank"]) for r in rows] == [
        ("a", 4, 1), ("b", 2, 2), ("c", 1, 3)
    ]
    assert [round(r["cum_coverage"], 9) for r in rows] == [
        round(4 / 7, 9), round(6 / 7, 9), 1.0
    ]


def test_vocab_coverage_tie_order_is_alphabetical(spark, monkeypatch):
    df = _docs(spark, ["z y z y"])
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    rows = sorted(
        textops.vocab_coverage_query(spark, "_").collect(),
        key=lambda r: r["vocab_rank"],
    )
    assert [r["token"] for r in rows] == ["y", "z"]  # equal counts: token ASC


# -- source_profile ---------------------------------------------------------


def test_source_profile_cross_source_dup_charging(spark, monkeypatch):
    rows = [
        # s1 doc 0 and s2 doc 2 are exact duplicates after normalization
        Row(doc_id=0, text="Hello  World", lang="en", source="s1", n_chars=12),
        Row(doc_id=1, text="unique one", lang="en", source="s1", n_chars=10),
        Row(doc_id=2, text="hello world", lang="fr", source="s2", n_chars=11),
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    got = {r["source"]: r for r in
           textops.source_profile_query(spark, "_").collect()}
    assert got["s1"]["n_docs"] == 2
    assert got["s1"]["total_tokens"] == 4
    assert got["s1"]["n_langs"] == 1
    assert got["s1"]["dup_rate"] == 0.5      # doc 0 duplicated in s2
    assert got["s2"]["n_docs"] == 1
    assert got["s2"]["n_langs"] == 1
    assert got["s2"]["dup_rate"] == 1.0      # its only doc exists in s1
    assert got["s1"]["avg_chars"] == 11.0


# -- boilerplate_ngrams -----------------------------------------------------


def test_boilerplate_ngrams_flags_high_df_shingles(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import dedup

    # "the same header text" shingles appear in ALL 12 docs (df=12 >
    # 12/10); each doc's tail is unique.
    texts = [f"the same header text unique{i} tail{i}" for i in range(12)]
    df = _docs(spark, texts)
    monkeypatch.setattr(dedup.tables, "table", lambda *a: df)
    got = {r["doc_id"]: r for r in
           dedup.boilerplate_ngrams_query(spark, "_").collect()}
    assert len(got) == 12
    r = got[0]
    # 6 tokens -> 4 shingles: "the same header", "same header text",
    # "header text uniqueN", "text uniqueN tailN"; the first two are
    # shared by all 12 docs
    assert r["n_shingles"] == 4
    assert r["boiler_shingles"] == 2
    assert r["boiler_frac"] == pytest.approx(0.5)


def test_boilerplate_ngrams_all_unique_corpus_is_clean(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import dedup

    texts = [f"alpha{i} beta{i} gamma{i} delta{i}" for i in range(11)]
    df = _docs(spark, texts)
    monkeypatch.setattr(dedup.tables, "table", lambda *a: df)
    rows = dedup.boilerplate_ngrams_query(spark, "_").collect()
    assert rows and all(r["boiler_shingles"] == 0 for r in rows)


# -- funnel_conversion ------------------------------------------------------


def test_funnel_order_matters(spark, monkeypatch):
    import datetime as dt

    from _kafka_streams_scaffold_spark.operators import analytics

    def ev(user, ts, typ):
        return Row(user_id=user, ts=dt.datetime.fromisoformat(ts),
                   event_type=typ)

    rows = [
        # user 1 completes the funnel in order
        ev(1, "2024-01-01T00:00:00", "signup"),
        ev(1, "2024-01-02T00:00:00", "click"),
        ev(1, "2024-01-03T00:00:00", "purchase"),
        # user 2: purchase BEFORE the click -> no conversion
        ev(2, "2024-01-01T00:00:00", "signup"),
        ev(2, "2024-01-03T00:00:00", "click"),
        ev(2, "2024-01-02T00:00:00", "purchase"),
        # user 3: click before signup doesn't count; no click after
        ev(3, "2024-01-02T00:00:00", "signup"),
        ev(3, "2024-01-01T00:00:00", "click"),
        # user 4: never signed up
        ev(4, "2024-01-01T00:00:00", "click"),
        ev(4, "2024-01-02T00:00:00", "purchase"),
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(analytics.tables, "table", lambda *a: df)
    r = analytics.funnel_conversion_query(spark, "_").collect()[0]
    assert (r["n_signup"], r["n_click_after"], r["n_purchase_after"]) == (3, 2, 1)


# -- source_overlap ---------------------------------------------------------


def test_source_overlap_counts_shared_fingerprints(spark, monkeypatch):
    rows = [
        Row(doc_id=0, text="Alpha  Beta", lang="en", source="s1", n_chars=10),
        Row(doc_id=1, text="alpha beta", lang="en", source="s2", n_chars=10),
        Row(doc_id=2, text="alpha beta", lang="en", source="s3", n_chars=10),
        Row(doc_id=3, text="gamma", lang="en", source="s1", n_chars=5),
        Row(doc_id=4, text="gamma", lang="en", source="s2", n_chars=5),
        # duplicate WITHIN s1 only: no pair row
        Row(doc_id=5, text="delta", lang="en", source="s1", n_chars=5),
        Row(doc_id=6, text="delta", lang="en", source="s1", n_chars=5),
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    got = {
        (r["source_a"], r["source_b"]): r["shared_fps"]
        for r in textops.source_overlap_query(spark, "_").collect()
    }
    assert got == {
        ("s1", "s2"): 2,   # alpha-beta (normalized) + gamma
        ("s1", "s3"): 1,
        ("s2", "s3"): 1,
    }


def test_corpus_keep_full_tightens_base_keep(spark, sf_dir):
    """keep_full implies keep (the v2 gates only ever remove), and at
    sf0.001 the added tiers actually fire on some base-kept docs."""
    from _kafka_streams_scaffold_spark.operators import curation

    rows = curation.corpus_keep_full_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["keep_full"]:
            assert r["keep"]
    assert any(r["keep"] for r in rows)
