"""Tests for the training-data-pipeline operators: text analysis,
dedup (exact / n-gram / MinHash-LSH / SimHash), similarity search."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import dedup, similarity, textops


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_exact_dedup_normalizes_whitespace_and_case(spark, monkeypatch):
    df = _docs(spark, ["Hello  World", "hello world", "other doc entirely"])
    monkeypatch.setattr(dedup.tables, "table", lambda *a: df)
    rows = dedup.exact_dedup_query(spark, "_").collect()
    by_rep = {r["rep_doc_id"]: r["n_copies"] for r in rows}
    assert by_rep == {0: 2, 2: 1}


def test_minhash_finds_planted_near_dup(spark, monkeypatch):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    other = "completely different text about spark query engines and shuffles"
    df = _docs(spark, [base, near, other + " " + other])
    monkeypatch.setattr(dedup.tables, "table", lambda *a: df)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs_query(spark, "_").collect()
    }
    assert (0, 1) in pairs
    assert all(p in {(0, 1)} for p in pairs)


def test_shingle_df_cap_bounds_fanout_keeps_true_pairs(spark, monkeypatch):
    """Hot boilerplate shingles (df > cap) are dropped before the
    inverted-index self-join, bounding per-key fan-out at
    CAP*(CAP-1)/2; true near-dup pairs (low-df shingles) survive."""
    boiler = "subscribe to our newsletter for updates every single day"
    n_boiler_docs = dedup.SHINGLE_DF_CAP + 10
    texts = [f"{boiler} unique filler item number {i} goes right here"
             for i in range(n_boiler_docs)]
    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat watches quietly from the tall garden fence nearby")
    texts.append(base)
    texts.append(base.replace("nearby", "today"))
    df = _docs(spark, texts)

    sh = dedup.shingles(df)
    max_df_raw = (
        sh.groupBy("shingle").count().agg({"count": "max"}).collect()[0][0]
    )
    assert max_df_raw > dedup.SHINGLE_DF_CAP  # the hot shingle exists
    capped = dedup.df_capped_shingles(sh)
    max_df_capped = (
        capped.groupBy("shingle").count().agg({"count": "max"}).collect()[0][0]
    )
    assert max_df_capped <= dedup.SHINGLE_DF_CAP

    monkeypatch.setattr(dedup.tables, "table", lambda *a: df)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs_query(spark, "_").collect()
    }
    assert (n_boiler_docs, n_boiler_docs + 1) in pairs
    assert all(a >= n_boiler_docs for a, _ in pairs)  # no boilerplate pairs


def test_shingle_df_cap_inert_on_testdata(spark, sf_dir):
    """On the driver testdata no shingle is hot (max df 25 at sf0.1),
    so capping changes nothing — pair results stay byte-identical to
    the uncapped formulation the oracle history was built on."""
    from _kafka_streams_scaffold_spark import tables

    sh = dedup.shingles(tables.table(spark, sf_dir, "documents"))
    assert dedup.df_capped_shingles(sh).count() == sh.count()


def test_simhash_identical_texts_distance_zero(spark, monkeypatch):
    df = _docs(spark, ["alpha beta gamma delta", "alpha beta gamma delta"])
    monkeypatch.setattr(dedup.tables, "table", lambda *a: df)
    sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash_query(spark, "_").collect()}
    assert sig[0] == sig[1]
    assert 0 <= sig[0] < 2**dedup.SIMHASH_BITS
    pairs = dedup.simhash_pairs_query(spark, "_").collect()
    assert [(p["doc_a"], p["doc_b"], p["hamming"]) for p in pairs] == [(0, 1, 0)]


def test_ann_topk_agrees_with_numpy(spark, sf_dir):
    got = similarity.ann_topk_query(spark, sf_dir).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    ids = sorted(emb)
    M = np.stack([emb[i] / np.linalg.norm(emb[i]) for i in ids])
    S = M @ M.T
    for r in [g for g in got if g["rank"] == 1]:
        qi = ids.index(r["q_id"])
        sims = S[qi].copy()
        sims[qi] = -np.inf
        best = ids[int(np.argmax(sims))]
        assert r["n_id"] == best, (r["q_id"], r["n_id"], best)
        assert abs(r["cosine"] - sims.max()) < 1e-9


def test_lsh_ann_is_subset_of_bucket_and_ranked(spark, sf_dir):
    rows = similarity.lsh_ann_query(spark, sf_dir).collect()
    assert all(1 <= r["rank"] <= similarity.TOP_K for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r)
    for q, rs in per_q.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))


def test_simhash_banding_complete_at_threshold():
    """Exhaustive pigeonhole proof: for EVERY choice of
    HAMMING_THRESHOLD differing bit positions, the two signatures
    still agree on at least one full band — so banded candidate
    generation has recall 1.0 within the threshold (the old 4x8
    banding missed distance-4 pairs with one bit per band)."""
    from itertools import combinations

    bounds = dedup._simhash_band_bounds()
    assert sum(w for _, w in bounds) == dedup.SIMHASH_BITS
    assert len(bounds) == dedup.SIMHASH_BANDS > dedup.HAMMING_THRESHOLD

    def bands(x):
        return [(x >> off) & ((1 << w) - 1) for off, w in bounds]

    base = bands(0)
    for flipped in combinations(range(dedup.SIMHASH_BITS), dedup.HAMMING_THRESHOLD):
        other = 0
        for bit in flipped:
            other |= 1 << bit
        assert any(u == v for u, v in zip(base, bands(other)))


def test_ivf_cells_bounded_under_growth(spark, sf_dir, monkeypatch):
    """Replicating the corpus 30x (distinct vec_ids, same 10 labels)
    must NOT grow any one cell 30x: the quantizer assignment is hash
    sub-split into ceil(n/target) cells, so the near-dup self-join's
    per-key fan-out stays ~target^2/2 at any corpus size."""
    from pyspark.sql import functions as F

    from _kafka_streams_scaffold_spark import tables

    base = tables.table(spark, sf_dir, "embeddings")
    n_base = base.count()
    big = base
    for i in range(1, 30):
        big = big.union(
            base.select(
                (F.col("vec_id") + i * n_base).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    monkeypatch.setattr(similarity.tables, "table", lambda *a: big)
    cells = similarity.ivf_cells(spark, "_")
    sizes = [
        r["count"]
        for r in cells.groupBy("assigned_label", "sub_id").count().collect()
    ]
    assert sum(sizes) == 30 * n_base
    # Hash split targets IVF_TARGET_CELL per cell; 2x slack covers
    # hash imbalance. Without the split the biggest label cell would
    # hold ~30*n/10 = 3*n vectors.
    assert max(sizes) <= 2 * similarity.IVF_TARGET_CELL


def test_ivf_ann_recall_and_probe_dial(spark, sf_dir, monkeypatch):
    """IVF search is exact within the probed cells: with every cell
    probed it equals the brute-force top-k exactly; at the default
    nprobe it trades recall for scanning nprobe/|cells| of the corpus
    (measured 0.48 @ nprobe=3 of 10 cells on this synthetic data,
    whose labels are only weakly cosine-clustered)."""
    exact = {
        (r["q_id"], r["n_id"])
        for r in similarity.ann_topk_query(spark, sf_dir).collect()
    }
    rows = similarity.ivf_ann_query(spark, sf_dir).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
    assert all(len(v) <= similarity.TOP_K for v in per_q.values())
    ivf = {(r["q_id"], r["n_id"]) for r in rows}
    assert len(ivf & exact) / len(exact) >= 0.4

    # Probing every cell makes IVF search exhaustive == brute force.
    monkeypatch.setattr(similarity, "N_PROBE", 10)
    all_cells = {
        (r["q_id"], r["n_id"])
        for r in similarity.ivf_ann_query(spark, sf_dir).collect()
    }
    assert all_cells == exact


def test_embedding_clusters_consistent_with_pairs(spark, sf_dir):
    """Every IVF near-dup edge's endpoints land in the same cluster,
    and each cluster is labeled by its minimum member id."""
    from _kafka_streams_scaffold_spark.operators import clustering

    pairs = similarity.ivf_near_dup_query(spark, sf_dir).collect()
    clusters = {
        r["vec_id"]: r["cluster_id"]
        for r in clustering.embedding_dup_clusters_query(
            spark, sf_dir
        ).collect()
    }
    assert pairs  # non-vacuous
    for p in pairs:
        assert clusters[p["vec_a"]] == clusters[p["vec_b"]]
    assert all(cid <= vid for vid, cid in clusters.items())
    members: dict[int, list[int]] = {}
    for vid, cid in clusters.items():
        members.setdefault(cid, []).append(vid)
    assert all(min(v) == cid for cid, v in members.items())


def test_quality_score_golden(spark, monkeypatch):
    df = _docs(spark, ["the cat sat"])
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    r = textops.quality_score_query(spark, "_").collect()[0]
    assert r["n_tokens"] == 3
    assert r["stopword_ratio"] == 1 / 3  # 'the'
    assert abs(r["avg_token_len"] - 3.0) < 1e-12
    expected = 0.4 * (3 / 50) + 0.3 * (9 / 11) + 0.3 * (2 / 3)
    assert abs(r["quality_score"] - expected) < 1e-12


def test_token_count_bpe_vs_ws(spark, monkeypatch):
    df = _docs(spark, ["don't stop-me now 123"])
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    r = textops.token_count_query(spark, "_").collect()[0]
    # ws: don/t/stop/me/now/123 after \W+ split -> 6
    assert r["ws_tokens"] == 6
    # bpe-ish: don ' t stop - me now 1 2 3 -> 10
    assert r["bpe_tokens"] == 10


def test_lang_id_deterministic_tiebreak(spark, monkeypatch):
    df = _docs(spark, ["the la", "zzz qqq"])
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    got = {r["doc_id"]: r["pred_lang"] for r in textops.lang_id_query(spark, "_").collect()}
    # doc 0: en=1 ('the'), es=1 ('la'), fr=1 ('la') -> tie, declaration order wins
    assert got[0] == "en"
    assert got[1] == "und"


def test_connected_components_chain_and_isolate(spark):
    from pyspark.sql import Row
    from _kafka_streams_scaffold_spark.operators import clustering

    # Chain 1-2-3-4 (worst-case diameter: min must hop 3 rounds),
    # pair 10-11, isolate 20.
    nodes = spark.createDataFrame([Row(doc_id=i) for i in [1, 2, 3, 4, 10, 11, 20]])
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=3, dst=4), Row(src=10, dst=11)]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in clustering.connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_label_centroids_golden(spark, monkeypatch):
    from pyspark.sql import Row
    from _kafka_streams_scaffold_spark.operators import similarity

    rows = [
        Row(vec_id=1, embedding=[1.0, 2.0], label=0),
        Row(vec_id=2, embedding=[3.0, 6.0], label=0),
        Row(vec_id=3, embedding=[10.0, 0.0], label=1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(similarity.tables, "table", lambda *a: df)
    got = {
        (r["label"], r["pos"]): (r["n"], r["centroid"])
        for r in similarity.label_centroids_query(spark, "x").collect()
    }
    assert got == {
        (0, 1): (2, 2.0),
        (0, 2): (2, 4.0),
        (1, 1): (1, 10.0),
        (1, 2): (1, 0.0),
    }


def test_pii_scan_golden(spark, monkeypatch):
    from pyspark.sql import Row
    from _kafka_streams_scaffold_spark.operators import textops

    rows = [
        Row(doc_id=1, text="mail me at a.b@example.com or see https://x.io/p",
            lang="en", source="s", n_chars=0),
        Row(doc_id=2, text="card 1234567890 and 999", lang="en", source="s",
            n_chars=0),
    ]
    monkeypatch.setattr(
        textops.tables, "table", lambda *a: spark.createDataFrame(rows)
    )
    got = {
        r["doc_id"]: (r["n_emails"], r["n_urls"], r["n_long_numbers"])
        for r in textops.pii_scan_query(spark, "x").collect()
    }
    assert got == {1: (1, 1, 0), 2: (0, 0, 1)}


def test_contamination_golden(spark, monkeypatch):
    from pyspark.sql import Row
    from _kafka_streams_scaffold_spark.operators import dedup

    rows = [
        # "benchmark" doc (id < 50)
        Row(doc_id=1, text="the quick brown fox jumps", lang="en", source="s",
            n_chars=0),
        # shares shingle "the quick brown" + "quick brown fox"
        Row(doc_id=100, text="see the quick brown fox run", lang="en",
            source="s", n_chars=0),
        # no overlap
        Row(doc_id=101, text="completely different words here", lang="en",
            source="s", n_chars=0),
    ]
    monkeypatch.setattr(
        dedup.tables, "table", lambda *a: spark.createDataFrame(rows)
    )
    got = {
        r["doc_id"]: r["n_contaminated_shingles"]
        for r in dedup.contamination_query(spark, "x").collect()
    }
    assert 100 in got and got[100] >= 2
    assert 101 not in got


def test_knn_graph_structure_and_mutuality(spark, sf_dir):
    rows = similarity.knn_graph_query(spark, sf_dir).collect()
    edges = {(r["vec_id"], r["nbr_id"]): r for r in rows}
    # every vector gets at most KNN_K neighbors, ranked 1..k densely
    per_q = {}
    for r in rows:
        per_q.setdefault(r["vec_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
        assert len(ranks) <= similarity.KNN_K
    # no self loops
    assert all(q != n for q, n in edges)
    # the mutual flag is exactly "reverse edge exists"
    for (q, n), r in edges.items():
        assert r["is_mutual"] == ((n, q) in edges), (q, n)
    # mutuality is symmetric on the mutual subgraph
    for (q, n), r in edges.items():
        if r["is_mutual"]:
            assert edges[(n, q)]["is_mutual"]


def test_knn_graph_rank1_matches_exact_within_cell(spark, sf_dir):
    """Within its assigned cell, every vector's rank-1 edge is the true
    nearest co-cell neighbor (numpy cross-check, same recall contract
    as the docstring states: exact within the cell)."""
    assign = {
        r["vec_id"]: r["assigned_label"]
        for r in similarity.ivf_assign_query(spark, sf_dir).collect()
    }
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    got = {
        r["vec_id"]: (r["nbr_id"], r["cosine"])
        for r in similarity.knn_graph_query(spark, sf_dir).collect()
        if r["rank"] == 1
    }
    for q, (n, cos) in list(got.items())[:50]:
        cell_mates = [v for v in emb if v != q and assign[v] == assign[q]]
        nq = emb[q] / np.linalg.norm(emb[q])
        sims = {v: float(nq @ (emb[v] / np.linalg.norm(emb[v]))) for v in cell_mates}
        best = max(sims, key=lambda v: (sims[v], -v))
        assert abs(cos - sims[n]) < 1e-9
        assert sims[n] >= sims[best] - 1e-12


def test_embedding_diversity_matches_naive_pairwise(spark, sf_dir):
    """The O(n) power-sum identity must equal the naive O(n^2) mean
    pairwise squared distance (on the fixed-point grid the operator
    computes on)."""
    got = {
        r["label"]: (r["n"], r["mean_pair_dist2"])
        for r in similarity.embedding_diversity_query(spark, sf_dir).collect()
    }
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    by_label = {}
    for r in rows:
        fp = np.floor(np.array(r["embedding"], dtype=np.float64) * 1e6)
        by_label.setdefault(r["label"], []).append(fp)
    for label, vecs in by_label.items():
        if len(vecs) < 2:
            assert label not in got
            continue
        n = len(vecs)
        M = np.stack(vecs)
        total = 0.0
        for i in range(n):
            for j in range(i + 1, n):
                d = M[i] - M[j]
                total += float(d @ d)
        expect = total / (n * (n - 1) / 2) / 1e12
        assert got[label][0] == n
        assert got[label][1] == pytest.approx(expect, rel=1e-9), label


def test_power_iteration_matches_numpy_model(spark, sf_dir):
    """Engine result equals numpy simulating the IDENTICAL fixed-point
    recurrence (Gram matvec, max-norm, floor to the 1e9 grid). numpy's
    matvec uses float sums where the engine uses exact decimal sums,
    so agreement is to ~1e-6 per component, not bit-exact — the
    bit-exact check is the DuckDB oracle."""
    from _kafka_streams_scaffold_spark.operators import spectral

    rows = spectral.power_iteration_query(spark, sf_dir).collect()
    assert len(rows) == spectral.DIM
    v_engine = np.zeros(spectral.DIM)
    for r in rows:
        v_engine[r["pos"] - 1] = r["component"]
    assert np.max(np.abs(v_engine)) == pytest.approx(1.0)

    emb = np.stack([
        np.floor(np.array(r["embedding"], dtype=np.float64) * 1e6)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ])
    G = emb.T @ emb
    v = np.full(spectral.DIM, 1e9)
    for _ in range(spectral.ROUNDS):
        s_vec = G @ v
        v = np.floor(s_vec / np.max(np.abs(s_vec)) * 1e9)
    model = v / 1e9
    assert np.allclose(v_engine, model, atol=1e-6)


def test_bpe_merge_candidates_weighted_counts(spark, monkeypatch):
    # "aab" x3, "ab" x2: pairs "aa" weight 3, "ab" weight 3+2=5;
    # single-char word "a" contributes nothing.
    df = _docs(spark, ["aab aab ab", "aab ab a"])
    monkeypatch.setattr(textops.tables, "table", lambda *a: df)
    rows = sorted(
        textops.bpe_merge_candidates_query(spark, "_").collect(),
        key=lambda r: r["merge_rank"],
    )
    assert [(r["pair"], r["weight"], r["merge_rank"]) for r in rows] == [
        ("ab", 5, 1), ("aa", 3, 2)
    ]


def test_token_rarity_orders_gibberish_above_boilerplate(spark, monkeypatch):
    """The rarity filter's contract: a doc of corpus-unique tokens
    scores strictly above a doc made of the corpus's most common
    tokens, and the values are the exact fixed-point linear-rarity
    means (N_total / count(t), floored at 1e-6)."""
    docs = _docs(spark, [
        "the cat sat on the mat",       # common words (repeated below)
        "the cat sat on the mat",
        "zxqv jkwpf mbrtz",             # corpus-unique gibberish
    ])
    monkeypatch.setattr(textops.tables, "table", lambda *a: docs)
    rows = {r["doc_id"]: r for r in
            textops.token_rarity_query(spark, "_").collect()}
    assert rows[2]["mean_rarity"] > rows[0]["mean_rarity"]
    # N_total = 15; gibberish tokens each have count 1 -> rarity 15.0
    assert abs(rows[2]["mean_rarity"] - 15.0) < 1e-6
    assert rows[2]["max_rarity"] == 15.0
    # doc 0: tokens the(x2@4),cat(2),sat(2),on(2),mat(2) ->
    # mean = (2*15/4 + 4*15/2)/6 = (7.5+7.5+30)/6 = 6.25
    assert abs(rows[0]["mean_rarity"] - 6.25) < 1e-6
    assert rows[0]["n_tokens"] == 6


def test_cluster_keep_list_keeps_exactly_one_per_cluster(spark, monkeypatch):
    """Every cluster keeps exactly its highest-pagerank member (ties
    to min doc_id); isolated docs keep themselves."""
    from _kafka_streams_scaffold_spark.operators import clustering

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(6)])
    # triangle 0-1-2 plus pendant 3 hanging off 1 => node 1 has max
    # degree/rank; symmetric 4-5 pair => equal ranks, tie to min id
    edges = spark.createDataFrame([
        Row(doc_a=0, doc_b=1), Row(doc_a=1, doc_b=2), Row(doc_a=0, doc_b=2),
        Row(doc_a=1, doc_b=3),
        Row(doc_a=4, doc_b=5),
    ])
    monkeypatch.setattr(clustering.tables, "table", lambda *a: docs)
    monkeypatch.setattr(
        clustering, "simhash_pairs_query", lambda s, sf: edges
    )
    rows = clustering.cluster_keep_list_query(spark, "_").collect()
    by_doc = {r["doc_id"]: r for r in rows}
    # one keep per cluster
    from collections import Counter
    keeps = Counter(r["cluster_id"] for r in rows if r["keep"])
    sizes = Counter(r["cluster_id"] for r in rows)
    assert keeps == Counter({cid: 1 for cid in sizes})
    # hub of the triangle+pendant cluster wins
    assert by_doc[1]["keep"] is True
    assert not by_doc[0]["keep"] and not by_doc[3]["keep"]
    # symmetric 4-5 pair: equal rank, tie to min doc_id
    assert by_doc[4]["keep"] is True and by_doc[5]["keep"] is False
    assert by_doc[4]["pagerank"] == by_doc[5]["pagerank"]
