"""Property-based tests for the round-5 closing operators: DSIR
importance weights and Apriori triples must equal an independent
Python model on arbitrary inputs."""

from __future__ import annotations

import datetime
import hashlib
import math
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import basket, lm

_WORD = st.sampled_from(["aa", "bb", "cc", "dd"])
_DOC = st.lists(_WORD, min_size=0, max_size=8).map(" ".join)
_LANG = st.sampled_from(["en", "fr"])

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _dsir_bucket(a: str, b: str) -> int:
    h = hashlib.md5(f"dsir|{a} {b}".encode()).hexdigest()[:8]
    return int(h, 16) % lm.DSIR_BUCKETS


@settings(**_SETTINGS)
@given(st.lists(st.tuples(_DOC, _LANG), min_size=1, max_size=6))
def test_dsir_matches_python_model(spark, docs_langs):
    df = spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang=lang, source="s", n_chars=len(t))
            for i, (t, lang) in enumerate(docs_langs)
        ]
    )
    real = lm.tables.table
    lm.tables.table = lambda *a: df
    try:
        got = {
            r["doc_id"]: r
            for r in lm.dsir_importance_query(spark, "_").collect()
        }
    finally:
        lm.tables.table = real

    feats: dict[int, list[int]] = {}
    ct: Counter = Counter()
    cr: Counter = Counter()
    for i, (t, lang) in enumerate(docs_langs):
        toks = [w for w in re.split(r"\W+", t.lower()) if w]
        bs = [_dsir_bucket(a, b) for a, b in zip(toks, toks[1:])]
        if bs:
            feats[i] = bs
        for b in bs:
            cr[b] += 1
            if lang == "en":
                ct[b] += 1
    B = lm.DSIR_BUCKETS
    tt = sum(ct.values()) + B
    rt = sum(cr.values()) + B
    lr = {
        b: math.floor(
            1e6
            * math.log(
                (float(ct[b] + 1) * float(rt))
                / (float(cr[b] + 1) * float(tt))
            )
        )
        for b in cr
    }
    assert set(got) == set(feats)
    for i, bs in feats.items():
        s = sum(lr[b] for b in bs)
        assert got[i]["n_feats"] == len(bs)
        assert math.isclose(got[i]["dsir_sum"], s / 1e6, rel_tol=0,
                            abs_tol=0.0)


_BASKET = st.lists(
    st.integers(min_value=1, max_value=5), min_size=1, max_size=4
)


@settings(**_SETTINGS)
@given(st.lists(_BASKET, min_size=1, max_size=8))
def test_basket_triples_match_brute_force(spark, baskets):
    rows = [
        Row(l_orderkey=ok, l_partkey=p, l_suppkey=1, l_linenumber=i,
            l_quantity=1.0, l_extendedprice=1.0, l_discount=0.0,
            l_tax=0.0, l_returnflag="N", l_linestatus="O",
            l_shipdate=datetime.datetime(2024, 1, 1))
        for ok, parts in enumerate(baskets)
        for i, p in enumerate(parts)
    ]
    df = spark.createDataFrame(rows)
    real = basket.tables.table
    basket.tables.table = lambda *a: df
    try:
        got = {
            (r["part_a"], r["part_b"], r["part_c"]): r["n_all"]
            for r in basket.basket_triples_query(spark, "_").collect()
        }
    finally:
        basket.tables.table = real

    sets = [set(b) for b in baskets]
    tri: Counter = Counter()
    for s in sets:
        items = sorted(s)
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                for z in range(y + 1, len(items)):
                    tri[(items[x], items[y], items[z])] += 1
    # brute-force: support floor only — anti-monotonicity makes the
    # sub-pair prune a no-op on EXACT counting (a frequent triple's
    # sub-pairs are at least as frequent), so the outputs must agree
    expect = {
        k: n for k, n in tri.items() if n >= basket.MIN_TRIPLE_SUPPORT
    }
    assert got == expect
