"""Round-9 post-freeze additions (R10_MATERIAL): golden semantics on
crafted frames, bruteforce parity on sf0.001, and the plan properties
that keep each shape 100x-safe."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import Row

from _kafka_streams_scaffold_spark import tables
from _kafka_streams_scaffold_spark.operators import (
    lexstats,
    similarity,
    stats,
    textops,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# tail_token_share
# ---------------------------------------------------------------------------


def test_tail_token_share_golden(spark, sf_dir, monkeypatch):
    docs = spark.createDataFrame(
        [
            # 'a' dominates globally -> head (K=10 covers the whole
            # tiny vocab here, so force a tail via many rare terms)
            Row(doc_id=1, source="s1", text=" ".join(["a"] * 50)),
            Row(doc_id=2, source="s2", text="a a " + " ".join(
                f"rare{i}" for i in range(15)
            )),
        ]
    )
    monkeypatch.setattr(
        lexstats.tables, "table", lambda *_, **__: docs
    )
    got = {r["source"]: r for r in
           lexstats.tail_token_share_query(spark, sf_dir).collect()}
    # global head = top-10 by count: 'a' (52) + 9 of the rare terms
    # (count 1, tok asc tiebreak: rare0..rare9 minus one) -> s2's
    # tail = the 6 rare terms that missed the head
    assert got["s1"]["n_tokens"] == 50 and got["s1"]["tail_tokens"] == 0
    assert got["s2"]["n_tokens"] == 17
    assert got["s2"]["tail_tokens"] == 6
    assert got["s2"]["tail_share"] == pytest.approx(6 / 17)


def test_tail_token_share_bruteforce(spark):
    rows = tables.table(spark, SF, "documents").collect()
    toks = []
    for r in rows:
        toks += [
            (r["source"], t)
            for t in __import__("re").split(r"\W+", r["text"].lower())
            if t
        ]
    glob = Counter(t for _, t in toks)
    head = set(
        t for t, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[
            : lexstats.TAIL_HEAD_K
        ]
    )
    per_src_tot = Counter(s for s, _ in toks)
    per_src_tail = Counter(s for s, t in toks if t not in head)
    got = {r["source"]: r for r in
           lexstats.tail_token_share_query(spark, SF).collect()}
    assert set(got) == set(per_src_tot)
    for s, row in got.items():
        assert row["n_tokens"] == per_src_tot[s]
        assert row["tail_tokens"] == per_src_tail.get(s, 0)


# ---------------------------------------------------------------------------
# log_odds_terms
# ---------------------------------------------------------------------------


def test_log_odds_sign_and_grid(spark, sf_dir, monkeypatch):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="s1", text="x x x x x y"),
            Row(doc_id=2, source="s2", text="y y y y y x"),
        ]
    )
    monkeypatch.setattr(
        lexstats.tables, "table", lambda *_, **__: docs
    )
    rows = lexstats.log_odds_terms_query(spark, sf_dir).collect()
    # full grid: 2 sources x 2 terms, zero-filled cells included
    assert len(rows) == 4
    z = {(r["source"], r["tok"]): r["z"] for r in rows}
    # x is over-represented in s1, under-represented in s2 (and
    # symmetrically for y) — the z signs must say so
    assert z[("s1", "x")] > 0 > z[("s1", "y")]
    assert z[("s2", "y")] > 0 > z[("s2", "x")]
    counts = {(r["source"], r["tok"]): (r["c_src"], r["c_rest"])
              for r in rows}
    assert counts[("s1", "x")] == (5, 1)
    assert counts[("s2", "x")] == (1, 5)


def test_log_odds_matches_bruteforce(spark):
    rows = lexstats.log_odds_terms_query(spark, SF).collect()
    docs = tables.table(spark, SF, "documents").collect()
    cnt: Counter = Counter()
    for r in docs:
        for t in __import__("re").split(r"\W+", r["text"].lower()):
            if t:
                cnt[(r["source"], t)] += 1
    cw = Counter()
    ns = Counter()
    for (s, t), c in cnt.items():
        cw[t] += c
        ns[s] += c
    n = sum(cw.values())
    a0 = float(lexstats._LO_ALPHA0)
    for r in rows[:50]:
        s, t = r["source"], r["tok"]
        c = cnt.get((s, t), 0)
        aw = a0 * cw[t] / n
        ys = c + aw
        yr = (cw[t] - c) + aw
        delta = math.log(ys / (ns[s] + a0 - ys)) - math.log(
            yr / ((n - ns[s]) + a0 - yr)
        )
        want = delta / math.sqrt(1.0 / ys + 1.0 / yr)
        assert r["z"] == pytest.approx(want, rel=1e-9)


# ---------------------------------------------------------------------------
# lexicon_gate_audit
# ---------------------------------------------------------------------------


def test_lexicon_gate_token_exact(spark, sf_dir, monkeypatch):
    docs = spark.createDataFrame(
        [
            # 'slowly' must NOT match the 'slow' entry (token-exact)
            Row(doc_id=1, source="s1", text="slowly but surely"),
            Row(doc_id=2, source="s1", text="slow scan slow merge"),
            Row(doc_id=3, source="s2", text="fast scan"),
        ]
    )
    monkeypatch.setattr(textops.tables, "table", lambda *_, **__: docs)
    got = {r["source"]: r for r in
           textops.lexicon_gate_audit_query(spark, sf_dir).collect()}
    assert got["s1"]["n_docs"] == 2
    assert got["s1"]["n_flagged"] == 1      # only doc 2
    assert got["s1"]["n_hits"] == 2         # slow x2 (merge not listed)
    assert got["s1"]["flag_rate"] == pytest.approx(0.5)
    assert got["s2"]["n_flagged"] == 0 and got["s2"]["n_hits"] == 0


def test_lexicon_gate_counts_multiword_hits(spark, sf_dir, monkeypatch):
    docs = spark.createDataFrame(
        [Row(doc_id=1, source="s", text="slow stale legacy stale")]
    )
    monkeypatch.setattr(textops.tables, "table", lambda *_, **__: docs)
    [row] = textops.lexicon_gate_audit_query(spark, sf_dir).collect()
    assert row["n_hits"] == 4 and row["n_flagged"] == 1


# ---------------------------------------------------------------------------
# v_measure_cells
# ---------------------------------------------------------------------------


def test_v_measure_bounds_and_fp_consistency(spark):
    [row] = similarity.v_measure_cells_query(spark, SF).collect()
    assert row["n"] > 0
    assert row["n_cells"] >= 1 and row["n_labels"] >= 1
    # fixed-point entropies are nonnegative by construction
    for c in ("hlc_fp", "hcl_fp", "hl_fp", "hc_fp"):
        assert row[c] >= 0
    # conditional entropy never exceeds the marginal (up to the 1e-6
    # fixed-point floor slack per distinct cell)
    for h in ("homogeneity", "completeness", "v_measure"):
        assert -1e-3 <= row[h] <= 1.0 + 1e-3


def test_v_measure_matches_bruteforce_entropies(spark):
    assign = similarity.ivf_assign_query(spark, SF).collect()
    joint = Counter(
        (r["assigned_label"], r["orig_label"]) for r in assign
    )
    nc = Counter()
    nl = Counter()
    for (c, l), v in joint.items():
        nc[c] += v
        nl[l] += v
    fp = similarity._VM_FP

    def fpsum(pairs):
        return sum(
            v * math.floor(fp * math.log(tot / v)) for v, tot in pairs
        )

    hlc = fpsum((v, nc[c]) for (c, l), v in joint.items())
    hcl = fpsum((v, nl[l]) for (c, l), v in joint.items())
    n = sum(joint.values())
    hl = fpsum((v, n) for v in nl.values())
    hc = fpsum((v, n) for v in nc.values())
    [row] = similarity.v_measure_cells_query(spark, SF).collect()
    assert (row["hlc_fp"], row["hcl_fp"]) == (hlc, hcl)
    assert (row["hl_fp"], row["hc_fp"]) == (hl, hc)


# ---------------------------------------------------------------------------
# recall_at_k_curve
# ---------------------------------------------------------------------------


def test_recall_curve_matches_bruteforce(spark):
    exact = {
        (r["q_id"], r["n_id"]): r["rank"]
        for r in similarity.ann_topk_query(spark, SF).collect()
    }
    probed = {
        (r["q_id"], r["n_id"]): r["rank"]
        for r in similarity.ivf_ann_query(spark, SF).collect()
    }
    got = {r["k"]: r for r in
           similarity.recall_at_k_curve_query(spark, SF).collect()}
    assert set(got) == {1, 3, similarity.TOP_K}
    for k, row in got.items():
        n_exact = sum(1 for rk in exact.values() if rk <= k)
        hits = sum(
            1
            for key, rk in exact.items()
            if rk <= k and probed.get(key, 99) <= k
        )
        assert row["n_exact"] == n_exact
        assert row["n_hits"] == hits
        assert row["recall"] == pytest.approx(hits / n_exact)
        assert 0.0 <= row["recall"] <= 1.0


# ---------------------------------------------------------------------------
# weighted_median_price
# ---------------------------------------------------------------------------


def test_weighted_median_golden(spark, sf_dir, monkeypatch):
    li = spark.createDataFrame(
        [
            # flag A: masses 1@100, 2@200, 3@300 (W=6; half=3) ->
            # cum(100)=1 <3<=, cum(200)=3 crosses (2*3 >= 6, 2*1 < 6)
            Row(l_returnflag="A", l_extendedprice=1.00, l_quantity=1.0),
            Row(l_returnflag="A", l_extendedprice=2.00, l_quantity=2.0),
            Row(l_returnflag="A", l_extendedprice=3.00, l_quantity=3.0),
            # flag B: single point
            Row(l_returnflag="B", l_extendedprice=5.00, l_quantity=7.0),
        ]
    )
    monkeypatch.setattr(stats.tables, "table", lambda *_, **__: li)
    got = {r["l_returnflag"]: r for r in
           stats.weighted_median_price_query(spark, sf_dir).collect()}
    assert got["A"]["median_price_cents"] == 200
    assert got["A"]["w_total"] == 6
    assert got["B"]["median_price_cents"] == 500
    # exactly one crossing row per flag
    assert len(got) == 2


def test_weighted_median_matches_bruteforce(spark):
    li = tables.table(spark, SF, "lineitem").collect()
    masses: dict[str, Counter] = {}
    for r in li:
        masses.setdefault(r["l_returnflag"], Counter())[
            math.floor(r["l_extendedprice"] * 100)
        ] += math.floor(r["l_quantity"])
    got = {r["l_returnflag"]: r for r in
           stats.weighted_median_price_query(spark, SF).collect()}
    assert set(got) == set(masses)
    for flag, m in masses.items():
        w_total = sum(m.values())
        cum = 0
        for cents in sorted(m):
            cum += m[cents]
            if 2 * cum >= w_total:
                break
        assert got[flag]["median_price_cents"] == cents
        assert got[flag]["w_total"] == w_total


# ---------------------------------------------------------------------------
# participation_ratio
# ---------------------------------------------------------------------------


def test_participation_ratio_matches_numpy(spark):
    import numpy as np

    from _kafka_streams_scaffold_spark.operators import pca

    emb = tables.table(spark, SF, "embeddings").collect()
    q = np.array(
        [
            [math.floor(pca.PCA_FP * float(x)) for x in r["embedding"]]
            for r in emb
        ],
        dtype=np.float64,
    )
    n = q.shape[0]
    m = q.T @ q
    s = q.sum(axis=0)
    c = n * m - np.outer(s, s)
    tr = float(np.trace(c))
    fro = float((c * c).sum())
    [row] = pca.participation_ratio_query(spark, SF).collect()
    assert row["n"] == n
    assert row["trace_c"] == pytest.approx(tr, rel=1e-12)
    assert row["trace_c2"] == pytest.approx(fro, rel=1e-9)
    assert row["participation_ratio"] == pytest.approx(
        tr * tr / fro, rel=1e-9
    )
    # PR is bounded by [1, d] for any non-degenerate spectrum
    assert 1.0 - 1e-9 <= row["participation_ratio"] <= row["dim"] + 1e-9


def test_participation_ratio_scale_invariance_identity(spark):
    """PR must equal (sum lambda)^2 / sum lambda^2 of the TRUE
    covariance regardless of the n^2 scale factor carried by the
    C' = n*M - S S^T cells (the ratio cancels it)."""
    import numpy as np

    from _kafka_streams_scaffold_spark.operators import pca

    emb = tables.table(spark, SF, "embeddings").collect()
    q = np.array(
        [
            [math.floor(pca.PCA_FP * float(x)) for x in r["embedding"]]
            for r in emb
        ],
        dtype=np.float64,
    )
    cov = np.cov(q.T, bias=True)
    lam = np.linalg.eigvalsh(cov)
    want = lam.sum() ** 2 / (lam * lam).sum()
    [row] = pca.participation_ratio_query(spark, SF).collect()
    assert row["participation_ratio"] == pytest.approx(want, rel=1e-6)


# ---------------------------------------------------------------------------
# kendall_w_detectors
# ---------------------------------------------------------------------------


def test_kendall_w_matches_bruteforce(spark):
    from _kafka_streams_scaffold_spark.operators import dedup

    docs = [r["doc_id"] for r in
            tables.table(spark, SF, "documents").select("doc_id").collect()]
    n = len(docs)
    m = len(dedup._TIERS)
    scores = {t: Counter() for t in dedup._TIERS}
    for t in dedup._TIERS:
        for r in dedup._tier_pairs(spark, SF, t).collect():
            scores[t][r["doc_a"]] += 1
            scores[t][r["doc_b"]] += 1
    # 2x midranks per tier
    r2 = Counter()
    tie_sum = 0
    for t in dedup._TIERS:
        vals = sorted(scores[t].get(d, 0) for d in docs)
        groups = Counter(vals)
        tie_sum += sum(c ** 3 - c for c in groups.values())
        cum = 0
        mid2 = {}
        for v in sorted(groups):
            c = groups[v]
            mid2[v] = 2 * cum + c + 1
            cum += c
        for d in docs:
            r2[d] += mid2[scores[t].get(d, 0)]
    s4 = sum((r2[d] - m * (n + 1)) ** 2 for d in docs)
    denom = m * m * (n ** 3 - n) - m * tie_sum
    [row] = dedup.kendall_w_detectors_query(spark, SF).collect()
    assert row["n_docs"] == n and row["n_tiers"] == m
    assert row["s4"] == pytest.approx(float(s4), rel=1e-12)
    assert row["tie_sum"] == pytest.approx(float(tie_sum), rel=1e-12)
    if denom > 0:
        assert row["w"] == pytest.approx(3.0 * s4 / denom, rel=1e-9)
        assert -1e-9 <= row["w"] <= 1.0 + 1e-9
    else:
        assert row["w"] is None
