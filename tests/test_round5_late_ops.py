"""Round-5 late additions: prefix-filter join, Matryoshka recall,
cluster cohesion, budget allocation, winnowing fingerprints, split
leakage audit, epoch interleave."""

from __future__ import annotations

from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import dedup, sampling, similarity


def _docs(spark, texts):
    return spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=t,
                lang="en",
                source="s",
                n_chars=len(t),
            )
            for i, t in enumerate(texts)
        ]
    )


# ---- prefix_filter_pairs -------------------------------------------------


def test_prefix_filter_finds_identical_pair(spark, monkeypatch):
    t = "alpha beta gamma delta epsilon zeta"
    other = "one two three four five six seven"
    docs = _docs(spark, [t, t, other])
    monkeypatch.setattr(dedup.tables, "table", lambda *a: docs)
    rows = dedup.prefix_filter_pairs_query(spark, "_").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    # identical shingle sets: i == sa == sb -> jaccard exactly 1
    assert r["jac_num"] == r["jac_den"] and r["jaccard"] == 1.0


def test_prefix_filter_threshold_is_exact_four_fifths(spark, monkeypatch):
    # doc0 has 5 shingles (7 tokens), doc1 shares exactly 4 of them and
    # adds none: i=4, sa=5, sb=4 -> jaccard 4/5 — must be INCLUDED
    # (>=, and 9*4 = 36 >= 4*(5+4) = 36 holds with integer math).
    a = "w1 w2 w3 w4 w5 w6 w7"
    b = "w1 w2 w3 w4 w5 w6"
    docs = _docs(spark, [a, b])
    monkeypatch.setattr(dedup.tables, "table", lambda *a_: docs)
    rows = dedup.prefix_filter_pairs_query(spark, "_").collect()
    assert len(rows) == 1
    assert rows[0]["jac_num"] == 4 and rows[0]["jac_den"] == 5


# ---- matryoshka_recall ---------------------------------------------------


def test_matryoshka_recall_bounds(spark, sf_dir):
    rows = similarity.matryoshka_recall_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_exact"] == similarity.TOP_K
        assert 0 <= r["n_hits"] <= r["n_exact"]
        assert abs(r["recall"] - r["n_hits"] / r["n_exact"]) < 1e-12


# ---- cluster_cohesion ----------------------------------------------------


def test_cluster_cohesion_covers_all_vectors(spark, sf_dir):
    from _kafka_streams_scaffold_spark import tables

    rows = similarity.cluster_cohesion_query(spark, sf_dir).collect()
    total = sum(r["n_members"] for r in rows)
    n_vecs = tables.table(spark, sf_dir, "embeddings").count()
    # every non-degenerate vector is scored against its own centroid
    assert 0 < total <= n_vecs
    for r in rows:
        assert r["min_cos"] <= r["avg_cos"] <= 1.0 + 1e-9


# ---- budget_allocation ---------------------------------------------------


def test_budget_allocation_sums_exactly_to_budget(spark, sf_dir):
    rows = sampling.budget_allocation_query(spark, sf_dir).collect()
    assert sum(r["alloc"] for r in rows) == sampling.ALLOCATION_BUDGET
    w_total = sum(r["weight_chars"] for r in rows)
    for r in rows:
        fl = sampling.ALLOCATION_BUDGET * r["weight_chars"] // w_total
        assert fl <= r["alloc"] <= fl + 1  # largest-remainder property


def test_budget_allocation_monotone_in_weight(spark, monkeypatch):
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="x", lang="en", source=s, n_chars=n)
            for i, (s, n) in enumerate(
                [("big", 700), ("mid", 250), ("tiny", 50)]
            )
        ]
    )
    monkeypatch.setattr(sampling.tables, "table", lambda *a: docs)
    rows = {
        r["source"]: r["alloc"]
        for r in sampling.budget_allocation_query(spark, "_").collect()
    }
    assert rows["big"] == 700 and rows["mid"] == 250 and rows["tiny"] == 50


# ---- winnowing_fingerprints ----------------------------------------------


def test_winnowing_window_count(spark, monkeypatch):
    # 8 tokens -> 6 positional 3-grams -> window starts 1..3 -> at most
    # 3 distinct fingerprints, at least 1 (the guarantee).
    docs = _docs(spark, ["t1 t2 t3 t4 t5 t6 t7 t8"])
    monkeypatch.setattr(dedup.tables, "table", lambda *a: docs)
    r = dedup.winnowing_fingerprints_query(spark, "_").collect()[0]
    assert r["n_grams"] == 6
    assert 1 <= r["n_fingerprints"] <= 6 - dedup.WINNOW_W + 1


def test_winnowing_identical_docs_share_fingerprints(spark, monkeypatch):
    t = "the quick brown fox jumps over the lazy dog tonight"
    docs = _docs(spark, [t, t])
    monkeypatch.setattr(dedup.tables, "table", lambda *a: docs)
    rows = dedup.winnowing_fingerprints_query(spark, "_").collect()
    assert len(rows) == 2
    a, b = sorted(rows, key=lambda r: r["doc_id"])
    for col in ("n_grams", "n_fingerprints", "min_fp", "fp_checksum"):
        assert a[col] == b[col]


def test_winnowing_short_doc_emits_nothing(spark, monkeypatch):
    # 5 tokens -> 3 grams < WINNOW_W -> no full window -> no row
    docs = _docs(spark, ["a b c d e"])
    monkeypatch.setattr(dedup.tables, "table", lambda *a_: docs)
    assert dedup.winnowing_fingerprints_query(spark, "_").count() == 0


# ---- split_leakage_audit -------------------------------------------------


def test_split_leakage_partitions_the_pair_table(spark, sf_dir):
    audit = sampling.split_leakage_audit_query(spark, sf_dir).collect()
    n_pairs = dedup.ngram_jaccard_pairs_query(spark, sf_dir).count()
    assert sum(r["n_pairs"] for r in audit) == n_pairs
    for r in audit:
        assert r["split_a"] <= r["split_b"]
        assert r["max_jaccard"] >= dedup.JACCARD_THRESHOLD


# ---- epoch_interleave ----------------------------------------------------


def test_epoch_interleave_is_a_permutation(spark, sf_dir):
    df = sampling.epoch_interleave_query(spark, sf_dir)
    n = df.count()
    assert df.select("global_pos").distinct().count() == n
    assert df.select("doc_id").distinct().count() == n


def test_epoch_interleave_round_robin_structure(spark, monkeypatch):
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="x", lang="en", source=s, n_chars=1)
            for i, s in enumerate(["a"] * 3 + ["b"] * 3)
        ]
    )
    monkeypatch.setattr(sampling.tables, "table", lambda *a_: docs)
    rows = sampling.epoch_interleave_query(spark, "_").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    # per-source ranks are 1..n, and global positions interleave the
    # two sources with stride n_sources
    for src, rs in by_src.items():
        ranks = sorted(r["shuffle_rank"] for r in rs)
        assert ranks == [1, 2, 3]
        for r in rs:
            expect = (r["shuffle_rank"] - 1) * 2 + (1 if src == "a" else 2)
            assert r["global_pos"] == expect


# ---- char_entropy --------------------------------------------------------


def test_char_entropy_known_values(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import textops

    # "aaaa": one symbol -> H = 0; "abab": two equal symbols -> H = 1 bit
    docs = _docs(spark, ["aaaa", "abab"])
    monkeypatch.setattr(textops.tables, "table", lambda *a: docs)
    rows = {
        r["doc_id"]: r for r in textops.char_entropy_query(spark, "_").collect()
    }
    assert rows[0]["n_distinct_chars"] == 1
    assert abs(rows[0]["entropy_bits"]) < 1e-6
    assert rows[1]["n_distinct_chars"] == 2
    # fixed-point floor can undershoot by <= 1e-6 per unit count
    assert abs(rows[1]["entropy_bits"] - 1.0) < 1e-4
    assert rows[1]["n_chars_counted"] == 4


def test_char_entropy_case_folded(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import textops

    docs = _docs(spark, ["AbAb"])
    monkeypatch.setattr(textops.tables, "table", lambda *a: docs)
    r = textops.char_entropy_query(spark, "_").collect()[0]
    assert r["n_distinct_chars"] == 2  # 'A' folds onto 'a'


# ---- l_diversity_audit ---------------------------------------------------


def test_l_diversity_low_diversity_class_flagged(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import dq

    cust = spark.createDataFrame(
        [
            # class (1,'A'): balances in ONE bucket -> l=1, at risk
            Row(c_custkey=1, c_name="x", c_nationkey=1, c_acctbal=100.0, c_mktsegment="A"),
            Row(c_custkey=2, c_name="y", c_nationkey=1, c_acctbal=200.0, c_mktsegment="A"),
            # class (2,'B'): three buckets -> l=3, safe
            Row(c_custkey=3, c_name="z", c_nationkey=2, c_acctbal=100.0, c_mktsegment="B"),
            Row(c_custkey=4, c_name="w", c_nationkey=2, c_acctbal=2100.0, c_mktsegment="B"),
            Row(c_custkey=5, c_name="v", c_nationkey=2, c_acctbal=4100.0, c_mktsegment="B"),
        ]
    )
    monkeypatch.setattr(dq.tables, "table", lambda *a: cust)
    rows = {r["l"]: r for r in dq.l_diversity_audit_query(spark, "_").collect()}
    assert rows[1]["n_classes"] == 1 and rows[1]["n_rows"] == 2
    assert rows[1]["at_risk"] is True
    assert rows[3]["n_classes"] == 1 and rows[3]["n_rows"] == 3
    assert rows[3]["at_risk"] is False


# ---- source_modularity -----------------------------------------------------


def test_source_modularity_identities(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import clustering

    rows = clustering.source_modularity_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # d_sum counts both endpoints of intra edges plus cut edges
        assert r["d_sum"] >= 2 * r["e_intra"]
    # sum of degree masses equals twice the edge count, so summing
    # d_sum over sources must be even, and intra edges can't exceed m
    total_d = sum(r["d_sum"] for r in rows)
    assert total_d % 2 == 0
    assert sum(r["e_intra"] for r in rows) <= total_d // 2


def test_source_modularity_single_source_is_zero(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import clustering

    # all docs in one source: e_intra == m and d_sum == 2m, so
    # q_num = 4m*m - 4m^2 = 0 exactly
    t = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="only", n_chars=len(t))
            for i in range(3)
        ]
    )
    monkeypatch.setattr(clustering.tables, "table", lambda *a: docs)
    monkeypatch.setattr(
        __import__(
            "_kafka_streams_scaffold_spark.operators.dedup", fromlist=["d"]
        ).tables,
        "table",
        lambda *a: docs,
    )
    rows = clustering.source_modularity_query(spark, "_").collect()
    assert len(rows) == 1
    assert rows[0]["q_num"] == 0 and rows[0]["q_contrib"] == 0.0


# ---- degree_assortativity --------------------------------------------------


def test_degree_assortativity_bounds(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import clustering

    r = clustering.degree_assortativity_query(spark, sf_dir).collect()[0]
    if r["assortativity"] is not None:
        assert -1.0 - 1e-9 <= r["assortativity"] <= 1.0 + 1e-9
    # directed edge list: n_edges is even (both directions counted)
    assert r["n_edges"] % 2 == 0


# ---- sorted_neighborhood_pairs ---------------------------------------------


def test_snm_pairs_are_a_subset_of_exact_pairs(spark, sf_dir):
    snm = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.sorted_neighborhood_pairs_query(spark, sf_dir).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs_query(spark, sf_dir).collect()
    }
    assert snm <= exact  # verification guarantees no false positives


def test_snm_finds_adjacent_prefix_family(spark, monkeypatch):
    base = "report section one two three four five six seven eight"
    near = base + " nine"  # same prefix, jaccard above threshold
    far = "completely different text body with other tokens entirely here"
    docs = _docs(spark, [base, near, far])
    monkeypatch.setattr(dedup.tables, "table", lambda *a: docs)
    rows = dedup.sorted_neighborhood_pairs_query(spark, "_").collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(0, 1)}


# ---- blocking_recall_audit -------------------------------------------------


def test_blocking_recall_audit_consistency(spark, sf_dir):
    rows = dedup.blocking_recall_audit_query(spark, sf_dir).collect()
    assert {r["strategy"] for r in rows} == {
        name for name, _bit in dedup._BLOCKING_STRATEGIES
    }
    n_true = {r["n_true"] for r in rows}
    assert len(n_true) == 1  # every row reports the same truth size
    for r in rows:
        assert 0 <= r["n_hit"] <= min(r["n_emitted"], r["n_true"])
        assert abs(r["recall"] - r["n_hit"] / r["n_true"]) < 1e-12


# ---- join_size_estimate ----------------------------------------------------


def test_join_size_estimate_accuracy_and_determinism(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import sketches

    a = sketches.join_size_estimate_query(spark, sf_dir).collect()[0]
    b = sketches.join_size_estimate_query(spark, sf_dir).collect()[0]
    assert a == b  # hash sampling, not rand(): reruns are identical
    assert a["exact_size"] > 0
    # 1/16 hash sample over thousands of keys: generous 25% bound
    assert abs(a["rel_err"]) < 0.25
    assert a["est_size"] % sketches._JS_RATE == 0


# ---- t_closeness_audit -----------------------------------------------------


def test_t_closeness_zero_for_class_matching_global(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import dq

    # two classes with IDENTICAL bucket distributions -> each class's
    # distribution equals the global one -> EMD exactly 0
    cust = spark.createDataFrame(
        [
            Row(c_custkey=i, c_name="x", c_nationkey=nk, c_acctbal=bal,
                c_mktsegment="A")
            for i, (nk, bal) in enumerate(
                [(1, 100.0), (1, 2100.0), (2, 100.0), (2, 2100.0)]
            )
        ]
    )
    monkeypatch.setattr(dq.tables, "table", lambda *a: cust)
    rows = dq.t_closeness_audit_query(spark, "_").collect()
    assert len(rows) == 2
    for r in rows:
        assert r["t_num"] == 0 and r["t_closeness"] == 0.0
        assert r["at_risk"] is False


def test_t_closeness_flags_skewed_class(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import dq

    # class 1 all in bucket 0, class 2 all in bucket 1: each class's
    # EMD to the 50/50 global is 1/2 > t = 1/5 -> both at risk
    cust = spark.createDataFrame(
        [
            Row(c_custkey=i, c_name="x", c_nationkey=nk, c_acctbal=bal,
                c_mktsegment="A")
            for i, (nk, bal) in enumerate(
                [(1, 100.0), (1, 150.0), (2, 2100.0), (2, 2200.0)]
            )
        ]
    )
    monkeypatch.setattr(dq.tables, "table", lambda *a: cust)
    rows = dq.t_closeness_audit_query(spark, "_").collect()
    assert len(rows) == 2
    for r in rows:
        assert abs(r["t_closeness"] - 0.5) < 1e-12
        assert r["at_risk"] is True


def test_t_closeness_on_testdata(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import dq

    rows = dq.t_closeness_audit_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["t_closeness"] <= 1.0 + 1e-12
        assert abs(r["t_closeness"] - r["t_num"] / r["t_den"]) < 1e-12


# ---- resize_payload --------------------------------------------------------


def test_resize_known_bytes(spark, monkeypatch):
    import hashlib

    from _kafka_streams_scaffold_spark.operators import multimodal

    text = "abcdefgh"  # n=8, target=32: out[i] = text[i*8//32] = text[i//4]
    docs = _docs(spark, [text])
    monkeypatch.setattr(multimodal.tables, "table", lambda *a: docs)
    r = multimodal.resize_payload_query(spark, "_").collect()[0]
    assert r["n_bytes_in"] == 8
    assert r["n_bytes_out"] == multimodal.RESIZE_TARGET
    expect = bytes(
        text.encode()[i * 8 // multimodal.RESIZE_TARGET]
        for i in range(multimodal.RESIZE_TARGET)
    )
    assert r["resized_checksum"] == hashlib.md5(expect).hexdigest()


def test_resize_real_codec_seam_raises(spark, monkeypatch):
    import pytest

    from _kafka_streams_scaffold_spark.operators import multimodal

    docs = _docs(spark, ["xyz"])
    monkeypatch.setattr(multimodal.tables, "table", lambda *a: docs)
    # the decode seam is in decode_features; resize shares the payload
    # plumbing — since round 11 the seam routes to the real TIMG/TAUD
    # codec, which must still raise loudly on UNFRAMED payloads
    with pytest.raises(Exception, match="unknown codec magic"):
        multimodal.decode_features(
            multimodal.with_payload(docs), decode="real"
        ).collect()


# ---- degenerate-input survival ---------------------------------------------


def test_round5_text_ops_survive_null_and_empty_docs(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import textops

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta eta theta",
                lang="en", source="a", n_chars=45),
            Row(doc_id=2, text="", lang="en", source="a", n_chars=0),
            Row(doc_id=3, text=None, lang="en", source="b", n_chars=0),
        ]
    )
    for mod in (dedup, sampling, textops):
        monkeypatch.setattr(mod.tables, "table", lambda *a: docs)
    # null/empty docs contribute nothing and nothing raises
    assert dedup.prefix_filter_pairs_query(spark, "_").count() == 0
    assert dedup.winnowing_fingerprints_query(spark, "_").count() == 1
    assert dedup.sorted_neighborhood_pairs_query(spark, "_").count() == 0
    ent = {r["doc_id"] for r in textops.char_entropy_query(spark, "_").collect()}
    assert ent == {1}  # empty and null docs have no characters
    alloc = sampling.budget_allocation_query(spark, "_").collect()
    assert sum(r["alloc"] for r in alloc) == sampling.ALLOCATION_BUDGET
    epoch = sampling.epoch_interleave_query(spark, "_").collect()
    assert len(epoch) == 3  # ordering is defined for every doc


def test_round5_graph_ops_survive_edgeless_graph(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import clustering

    # two docs with nothing in common: SimHash pairs is empty
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="aa bb cc dd ee ff gg hh", lang="en",
                source="a", n_chars=23),
            Row(doc_id=2, text="one two three four five six seven eight",
                lang="en", source="b", n_chars=39),
        ]
    )
    for mod in (dedup, clustering):
        monkeypatch.setattr(mod.tables, "table", lambda *a: docs)
    assert clustering.source_modularity_query(spark, "_").count() == 0
    r = clustering.degree_assortativity_query(spark, "_").collect()
    # either no edges at all (empty one-row agg with NULLs) or defined
    assert len(r) == 1
    assert r[0]["n_edges"] in (0, None) or r[0]["n_edges"] >= 0


def test_blocking_recall_survives_truthless_corpus(spark, monkeypatch):
    # simhash is order-insensitive (bag of words) so reversed docs
    # collide at hamming 0, but 3-gram shingles disagree: candidate
    # pairs exist while the truth set is EMPTY -> recall must be NULL,
    # not a division error
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="aa bb cc dd ee ff gg hh", lang="en",
                source="a", n_chars=23),
            Row(doc_id=2, text="hh gg ff ee dd cc bb aa", lang="en",
                source="a", n_chars=23),
        ]
    )
    monkeypatch.setattr(dedup.tables, "table", lambda *a: docs)
    rows = dedup.blocking_recall_audit_query(spark, "_").collect()
    assert rows  # the emitting strategies still report
    for r in rows:
        assert r["n_true"] == 0 and r["recall"] is None


# ---- systematic_weighted_sample --------------------------------------------


def test_systematic_sample_multiplicities_sum_to_k(spark, sf_dir):
    rows = sampling.systematic_weighted_sample_query(spark, sf_dir).collect()
    assert sum(r["multiplicity"] for r in rows) == sampling.SYS_SAMPLE_K
    for r in rows:
        assert r["multiplicity"] >= 1


def test_systematic_sample_heavy_doc_always_selected(spark, monkeypatch):
    # one doc holds half the mass: with K=100 pointers it must be
    # selected ~K/2 times; light docs at most once
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="x", lang="en", source="s",
                n_chars=(1000 if i == 7 else 10))
            for i in range(101)
        ]
    )
    monkeypatch.setattr(sampling.tables, "table", lambda *a: docs)
    rows = {
        r["doc_id"]: r["multiplicity"]
        for r in sampling.systematic_weighted_sample_query(spark, "_").collect()
    }
    assert sum(rows.values()) == sampling.SYS_SAMPLE_K
    # doc 7 carries 1000/2000 of the mass -> ~50 pointers
    assert rows[7] >= 49
    assert all(m == 1 for d, m in rows.items() if d != 7)


# ---- trimmed_mean_by_type --------------------------------------------------


def test_trimmed_mean_drops_outliers(spark, monkeypatch):
    import datetime

    from _kafka_streams_scaffold_spark.operators import stats

    base = datetime.datetime(2024, 1, 1)
    # 8 values: two extremes (0.0, 1000.0) must be trimmed (k = 2 each
    # side), mean of the middle four 10.0s is exactly 10.0
    vals = [0.0, 5.0, 10.0, 10.0, 10.0, 10.0, 20.0, 1000.0]
    ev = spark.createDataFrame(
        [
            Row(event_id=i, ts=base, user_id=1, event_type="a",
                value=v, props="{}")
            for i, v in enumerate(vals)
        ]
    )
    monkeypatch.setattr(stats.tables, "table", lambda *a: ev)
    r = stats.trimmed_mean_by_type_query(spark, "_").collect()[0]
    assert r["n_values"] == 8 and r["n_kept"] == 4
    assert abs(r["trimmed_mean"] - 10.0) < 1e-9


def test_trimmed_mean_small_group_keeps_everything(spark, monkeypatch):
    import datetime

    from _kafka_streams_scaffold_spark.operators import stats

    base = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            Row(event_id=i, ts=base, user_id=1, event_type="a",
                value=float(v), props="{}")
            for i, v in enumerate([2.0, 4.0, 6.0])
        ]
    )
    monkeypatch.setattr(stats.tables, "table", lambda *a: ev)
    r = stats.trimmed_mean_by_type_query(spark, "_").collect()[0]
    # n=3 -> k=0 -> nothing trimmed
    assert r["n_kept"] == 3 and abs(r["trimmed_mean"] - 4.0) < 1e-9


# ---- phrase_search ---------------------------------------------------------


def test_phrase_search_finds_exact_adjacency_only(spark, monkeypatch):
    from _kafka_streams_scaffold_spark.operators import textops

    docs = _docs(
        spark,
        [
            "red fox red fox jumps",      # "red fox" twice, adjacent
            "fox red something",           # reversed -> no match
            "red stone fox",               # not adjacent -> no match
            "red fox",                     # once
        ],
    )
    monkeypatch.setattr(textops.tables, "table", lambda *a: docs)
    rows = textops.phrase_search_query(spark, "_").collect()
    assert all(
        (r["term_a"], r["term_b"]) == ("red", "fox") for r in rows
    )
    got = {r["doc_id"]: r["n_occurrences"] for r in rows}
    assert got == {0: 2, 3: 1}


# ---- winnowing_pairs -------------------------------------------------------


def test_winnowing_pairs_find_identical_docs(spark, monkeypatch):
    t = "the quick brown fox jumps over the lazy dog again tonight ok"
    other = "completely different words appear inside this other document body"
    docs = _docs(spark, [t, t, other])
    monkeypatch.setattr(dedup.tables, "table", lambda *a: docs)
    rows = dedup.winnowing_pairs_query(spark, "_").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["n_shared_fps"] >= dedup.WINNOW_MIN_SHARED
    assert r["jaccard"] == 1.0


def test_winnowing_pairs_subset_of_exact(spark, sf_dir):
    wp = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.winnowing_pairs_query(spark, sf_dir).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs_query(spark, sf_dir).collect()
    }
    assert wp <= exact  # verification guarantees no false positives


# ---- bigram_lm_score -------------------------------------------------------


def test_bigram_lm_scores_word_order(spark, monkeypatch):
    import math

    from _kafka_streams_scaffold_spark.operators import lm

    # "a b" appears 3x, "a c" 1x: p(b|a)=3/4, p(c|a)=1/4
    docs = _docs(spark, ["a b", "a b", "a b", "a c"])
    monkeypatch.setattr(lm.tables, "table", lambda *a: docs)
    rows = {
        r["doc_id"]: r for r in lm.bigram_lm_score_query(spark, "_").collect()
    }
    assert rows[0]["n_bigrams"] == 1
    # fixed-point floor undershoots by < 1e-6
    assert abs(rows[0]["avg_surprisal"] - math.log(4 / 3)) < 1e-5
    assert abs(rows[3]["avg_surprisal"] - math.log(4)) < 1e-5


def test_bigram_gap_detects_shuffled_text(spark, sf_dir):
    from _kafka_streams_scaffold_spark.operators import lm

    uni = {
        r["doc_id"]: r["avg_surprisal"]
        for r in lm.unigram_lm_score_query(spark, sf_dir).collect()
    }
    bi = {
        r["doc_id"]: r["avg_surprisal"]
        for r in lm.bigram_lm_score_query(spark, sf_dir).collect()
    }
    common = set(uni) & set(bi)
    assert common
    # conditioning can only reduce average surprisal corpus-wide
    assert sum(bi[d] for d in common) <= sum(uni[d] for d in common)


# ---- transition_entropy ----------------------------------------------------


def test_transition_entropy_known_values(spark, monkeypatch):
    import datetime

    from _kafka_streams_scaffold_spark.operators import analytics

    base = datetime.datetime(2024, 1, 1)
    # user 1: a->b, b->a, a->b ; user 2: a->b
    # from 'a': 3x b (entropy 0); from 'b': 1x a (entropy 0)
    seq = [(1, "a"), (1, "b"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    ev = spark.createDataFrame(
        [
            Row(event_id=i, ts=base + datetime.timedelta(seconds=i),
                user_id=u, event_type=t, value=1.0, props="{}")
            for i, (u, t) in enumerate(seq)
        ]
    )
    monkeypatch.setattr(analytics.tables, "table", lambda *a: ev)
    rows = {
        r["from_type"]: r
        for r in analytics.transition_entropy_query(spark, "_").collect()
    }
    assert rows["a"]["n_distinct_next"] == 1
    assert abs(rows["a"]["entropy_bits"]) < 1e-6
    assert rows["b"]["n_transitions"] == 1
