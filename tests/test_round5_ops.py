"""Round-5 additions: corpus lexical statistics (hapax, fertility,
co-occurrence, log-bucketed lengths, prefix dup) and customer-value
segmentation (RFM quartiles, spend Gini, order cadence)."""

from __future__ import annotations

import datetime
import itertools

from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import lexstats, segmentation


def _docs(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=t,
                lang=lang,
                source=src,
                n_chars=len(t),
            )
            for i, (t, lang, src) in enumerate(rows)
        ]
    )


# --------------------------------------------------------------------------
# lexstats
# --------------------------------------------------------------------------

def test_hapax_rate_counts(spark, monkeypatch):
    docs = _docs(
        spark,
        [
            ("the cat sat the mat", "en", "a"),  # the x2; cat/sat/mat hapax
            ("dog dog dog", "en", "b"),  # zero hapax
        ],
    )
    monkeypatch.setattr(lexstats.tables, "table", lambda *a: docs)
    rows = {r["source"]: r for r in lexstats.hapax_rate_query(spark, "_").collect()}
    assert rows["a"]["n_terms"] == 4
    assert rows["a"]["n_hapax"] == 3
    assert abs(rows["a"]["hapax_ratio"] - 0.75) < 1e-12
    assert rows["b"]["n_terms"] == 1 and rows["b"]["n_hapax"] == 0


def test_tokenizer_fertility_and_empty_doc_guard(spark, monkeypatch):
    docs = _docs(
        spark,
        [
            ("abcd efgh", "en", "a"),  # 2 tokens, 9 chars
            ("!!!", "xx", "a"),  # 0 tokens -> NULL fertility for xx
        ],
    )
    monkeypatch.setattr(lexstats.tables, "table", lambda *a: docs)
    rows = {
        r["lang"]: r
        for r in lexstats.tokenizer_fertility_query(spark, "_").collect()
    }
    assert rows["en"]["n_tokens"] == 2
    assert abs(rows["en"]["chars_per_token"] - 4.5) < 1e-12
    assert rows["xx"]["chars_per_token"] is None


def test_term_cooccurrence_exact_lift(spark, monkeypatch):
    # 4 docs; (alpha, beta) co-occur in 2, alpha df=3, beta df=2
    docs = _docs(
        spark,
        [
            ("alpha beta", "en", "a"),
            ("alpha beta gamma", "en", "a"),
            ("alpha gamma", "en", "a"),
            ("delta", "en", "a"),
        ],
    )
    monkeypatch.setattr(lexstats.tables, "table", lambda *a: docs)
    out = {
        (r["term_a"], r["term_b"]): r
        for r in lexstats.term_cooccurrence_query(spark, "_").collect()
    }
    ab = out[("alpha", "beta")]
    assert ab["c_ab"] == 2 and ab["c_a"] == 3 and ab["c_b"] == 2
    assert ab["lift_num"] == 2 * 4 and ab["lift_den"] == 3 * 2
    # pairs below the support floor are not emitted
    assert ("beta", "gamma") not in out


def test_term_cooccurrence_pair_bound(spark, sf_dir):
    """The pair generator is vocabulary-bounded: every emitted term is
    one of the top-V df terms, so no document can contribute more than
    V(V-1)/2 pairs regardless of its length."""
    out = lexstats.term_cooccurrence_query(spark, sf_dir).collect()
    terms = {r["term_a"] for r in out} | {r["term_b"] for r in out}
    assert len(terms) <= lexstats._COOC_TOP_V
    assert len(out) <= lexstats._COOC_TOP_V * (lexstats._COOC_TOP_V - 1) // 2


def test_doclen_log_hist_bucket_edges(spark, monkeypatch):
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="x", lang="en", source="s", n_chars=n)
            for i, n in enumerate([1, 2, 3, 4, 7, 8, 1023, 1024])
        ]
    )
    monkeypatch.setattr(lexstats.tables, "table", lambda *a: docs)
    rows = {
        r["bucket"]: r
        for r in lexstats.doclen_log_hist_query(spark, "_").collect()
    }
    assert rows[0]["n_docs"] == 1 and rows[0]["bucket_lo"] == 1
    assert rows[1]["n_docs"] == 2 and rows[1]["bucket_lo"] == 2  # 2,3
    assert rows[2]["n_docs"] == 2 and rows[2]["bucket_lo"] == 4  # 4,7
    assert rows[3]["n_docs"] == 1 and rows[3]["bucket_lo"] == 8
    assert rows[9]["n_docs"] == 1 and rows[9]["bucket_lo"] == 512  # 1023
    assert rows[10]["n_docs"] == 1 and rows[10]["bucket_lo"] == 1024


def test_prefix_dup_groups(spark, monkeypatch):
    shared = "p" * lexstats._PREFIX_LEN
    docs = _docs(
        spark,
        [
            (shared + " tail one", "en", "a"),
            (shared + " a different tail", "en", "a"),
            ("q" * lexstats._PREFIX_LEN + " unique", "en", "a"),
            ("short", "en", "a"),  # below prefix length: excluded
        ],
    )
    monkeypatch.setattr(lexstats.tables, "table", lambda *a: docs)
    out = lexstats.prefix_dup_groups_query(spark, "_").collect()
    assert len(out) == 1
    g = out[0]
    assert g["n_docs"] == 2 and g["min_doc_id"] == 0 and g["max_doc_id"] == 1


# --------------------------------------------------------------------------
# segmentation
# --------------------------------------------------------------------------

def _cust_orders(spark, orders):
    """orders: list of (custkey, day_offset, price)."""
    custkeys = sorted({c for c, _, _ in orders})
    cust = spark.createDataFrame(
        [
            Row(
                c_custkey=c,
                c_name=f"c{c}",
                c_nationkey=0,
                c_acctbal=0.0,
                c_mktsegment="SEG",
            )
            for c in custkeys
        ]
    )
    base = datetime.datetime(2024, 1, 1)
    od = spark.createDataFrame(
        [
            Row(
                o_orderkey=i,
                o_custkey=c,
                o_orderstatus="F",
                o_totalprice=float(p),
                o_orderdate=base + datetime.timedelta(days=d),
                o_orderpriority="1-URGENT",
            )
            for i, (c, d, p) in enumerate(orders)
        ]
    )
    return {"customer": cust, "orders": od}


def _patch(monkeypatch, frames):
    monkeypatch.setattr(
        segmentation.tables, "table", lambda sp, sf, name: frames[name]
    )


def test_rfm_scores_are_quartile_consistent(spark, monkeypatch):
    # 4 customers, clearly separated metrics: customer k places in
    # quartile k for frequency and monetary, inverse for recency.
    orders = []
    for k in range(1, 5):  # custkeys 1..4
        for j in range(k):  # frequency k
            orders.append((k, 10 * k + j, 100.0 * k))
    frames = _cust_orders(spark, orders)
    _patch(monkeypatch, frames)
    out = segmentation.rfm_segments_query(spark, "_").collect()
    assert sum(r["n_cust"] for r in out) == 4
    cells = {
        (r["r_score"], r["f_score"], r["m_score"]): r["m_total_cents"]
        for r in out
    }
    # the heaviest spender (cust 4: 4 orders x 400) tops F and M
    assert cells[(1, 4, 4)] == 4 * 400 * 100
    # scores stay in 1..4
    for r, f, m in cells:
        assert 1 <= r <= 4 and 1 <= f <= 4 and 1 <= m <= 4


def test_spend_gini_matches_pairwise_definition(spark, monkeypatch):
    spends = [100.0, 100.0, 300.0, 500.0]
    frames = _cust_orders(
        spark, [(i + 1, i, s) for i, s in enumerate(spends)]
    )
    _patch(monkeypatch, frames)
    out = segmentation.spend_gini_query(spark, "_").collect()[0]
    cents = [int(s * 100) for s in spends]
    n, tot = len(cents), sum(cents)
    pairwise = sum(
        abs(a - b) for a, b in itertools.product(cents, repeat=2)
    ) / (2 * n * tot)
    assert out["n_cust"] == n and out["total_cents"] == tot
    assert abs(out["gini"] - pairwise) < 1e-12


def test_spend_gini_equal_spend_is_zero(spark, monkeypatch):
    frames = _cust_orders(spark, [(1, 0, 50.0), (2, 1, 50.0), (3, 2, 50.0)])
    _patch(monkeypatch, frames)
    out = segmentation.spend_gini_query(spark, "_").collect()[0]
    assert out["gini"] == 0.0


def test_order_gap_stats(spark, monkeypatch):
    # cust 1: orders on days 0, 10, 40 -> gaps 10, 30
    # cust 2: single order -> no gaps
    frames = _cust_orders(
        spark, [(1, 0, 10.0), (1, 10, 10.0), (1, 40, 10.0), (2, 5, 10.0)]
    )
    _patch(monkeypatch, frames)
    out = segmentation.order_gap_stats_query(spark, "_").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_gaps"] == 2
    assert abs(r["avg_gap_days"] - 20.0) < 1e-12
    assert r["max_gap_days"] == 30
