"""Property tests for the round-10 post-freeze additions
(R11_MATERIAL): kruskal_wallis_sources, brown_forsythe_lengths,
page_hinkley_drift. Each is verified against a from-scratch driver-side
brute force at sf0.001, plus a synthetic-shift alarm test for the
Page-Hinkley detector."""

from __future__ import annotations

import datetime
from collections import Counter, defaultdict

import pytest
from pyspark.sql import Row

from _kafka_streams_scaffold_spark import tables
from _kafka_streams_scaffold_spark.operators import drift, inference

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# kruskal_wallis_sources
# ---------------------------------------------------------------------------


def test_kruskal_wallis_matches_bruteforce(spark):
    rows = [
        (r["source"], r["n_chars"])
        for r in tables.table(spark, SF, "documents")
        .select("source", "n_chars")
        .collect()
    ]
    pooled = Counter(v for _, v in rows)
    n = len(rows)
    # 2x midranks over the pooled value spine
    mid2 = {}
    cum = 0
    for v in sorted(pooled):
        mid2[v] = 2 * cum + pooled[v] + 1
        cum += pooled[v]
    r2 = defaultdict(int)
    n_g = Counter()
    for s, v in rows:
        r2[s] += mid2[v]
        n_g[s] += 1
    r2sq_over_n = sum(
        (r2[s] ** 2) / (4.0 * n_g[s]) for s in sorted(r2)
    )
    tie_sum = sum(c**3 - c for c in pooled.values())
    h = 12.0 * r2sq_over_n / (n * (n + 1.0)) - 3.0 * (n + 1.0)
    corr = 1.0 - tie_sum / (float(n) ** 3 - n)

    [row] = inference.kruskal_wallis_sources_query(spark, SF).collect()
    assert row["n_rows"] == n
    assert row["n_groups"] == len(n_g)
    assert row["r2sq_over_n"] == pytest.approx(r2sq_over_n, rel=1e-12)
    assert row["tie_sum"] == pytest.approx(float(tie_sum), rel=1e-12)
    assert row["h"] == pytest.approx(h, rel=1e-9)
    assert row["h_corrected"] == pytest.approx(h / corr, rel=1e-9)
    # H is nonnegative up to float fuzz and grows with group count
    assert row["h"] >= -1e-9


def test_kruskal_wallis_identical_groups_gives_zero_h(spark, monkeypatch):
    """Sources with IDENTICAL length distributions -> every group's
    mean rank equals the grand mean rank -> H == 0 exactly (the
    midrank algebra collapses; a nonzero value would be a ranking
    bug, not noise)."""
    rows = [
        Row(doc_id=i * 10 + j, source=f"s{j}", n_chars=100 + (i % 5),
            text="x", lang="en")
        for i in range(20)
        for j in range(3)
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(inference.tables, "table", lambda *a: df)
    [row] = inference.kruskal_wallis_sources_query(spark, "_").collect()
    assert row["h"] == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# brown_forsythe_lengths
# ---------------------------------------------------------------------------


def test_brown_forsythe_matches_bruteforce(spark):
    rows = [
        (r["source"], r["n_chars"])
        for r in tables.table(spark, SF, "documents")
        .select("source", "n_chars")
        .collect()
    ]
    by_src = defaultdict(list)
    for s, v in rows:
        by_src[s].append(v)
    # lower median: order statistic at ceil(n/2)
    med = {
        s: sorted(vs)[(len(vs) + 1) // 2 - 1] for s, vs in by_src.items()
    }
    z = {s: [abs(v - med[s]) for v in vs] for s, vs in by_src.items()}
    n = sum(len(vs) for vs in z.values())
    k = len(z)
    s_all = sum(sum(vs) for vs in z.values())
    ss_all = sum(sum(x * x for x in vs) for vs in z.values())
    sum_sq_over_n = sum(
        (sum(z[s]) ** 2) / float(len(z[s])) for s in sorted(z)
    )
    grand = float(s_all) * s_all / n
    ssb = sum_sq_over_n - grand
    ssw = float(ss_all) - sum_sq_over_n
    f = (ssb / (k - 1)) / (ssw / (n - k))

    [row] = inference.brown_forsythe_lengths_query(spark, SF).collect()
    assert row["n_rows"] == n
    assert row["n_groups"] == k
    assert row["ss_between_z"] == pytest.approx(ssb, rel=1e-9)
    assert row["ss_within_z"] == pytest.approx(ssw, rel=1e-12)
    assert row["f_stat"] == pytest.approx(f, rel=1e-9)


def test_brown_forsythe_detects_pure_spread_difference(spark, monkeypatch):
    """Two sources with the SAME median and mean but one twice as
    dispersed: the location ANOVA must see ~nothing while
    Brown-Forsythe's F is large — the exact pathology the operator
    exists to catch."""
    tight = [100 + d for d in (-1, 0, 0, 1) * 25]
    wide = [100 + d for d in (-50, 0, 0, 50) * 25]
    rows = [
        Row(doc_id=i, source="tight", n_chars=v, text="x", lang="en")
        for i, v in enumerate(tight)
    ] + [
        Row(doc_id=1000 + i, source="wide", n_chars=v, text="x", lang="en")
        for i, v in enumerate(wide)
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(inference.tables, "table", lambda *a: df)
    [bf] = inference.brown_forsythe_lengths_query(spark, "_").collect()
    [loc] = inference.anova_source_lengths_query(spark, "_").collect()
    assert bf["f_stat"] > 50.0
    assert loc["eta_squared"] == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# page_hinkley_drift
# ---------------------------------------------------------------------------


def test_page_hinkley_matches_bruteforce(spark):
    daily = sorted(
        (r["day"], r["x"])
        for r in tables.table(spark, SF, "events")
        .selectExpr("cast(ts as date) as day")
        .groupBy("day")
        .count()
        .withColumnRenamed("count", "x")
        .collect()
    )
    xs = [x for _, x in daily]
    b = min(drift._PH_BASELINE_DAYS, len(xs))
    s_b = sum(xs[:b])
    v, run_min, expect = [], None, []
    s_t = 0
    for t, x in enumerate(xs, start=1):
        s_t += x
        vt = b * s_t - t * s_b - t * b * drift._PH_DELTA
        run_min = vt if run_min is None else min(run_min, vt)
        expect.append((vt, vt - run_min, int(vt - run_min > b * drift._PH_LAMBDA)))

    got = (
        drift.page_hinkley_drift_query(spark, SF)
        .orderBy("day")
        .collect()
    )
    assert len(got) == len(xs)
    for row, (vt, ph, alarm) in zip(got, expect):
        assert row["v_stat"] == vt
        assert row["ph_stat"] == ph
        assert row["alarm"] == alarm
    assert all(r["ph_stat"] >= 0 for r in got)


def test_page_hinkley_alarms_on_level_shift(spark, monkeypatch):
    """A clean +10x level shift after the baseline week must alarm,
    and the flat prefix must not."""
    base = datetime.datetime(2025, 1, 1)
    rows = []
    eid = 0
    for d in range(21):
        n = 100 if d < 10 else 1000
        for _ in range(n):
            rows.append(
                Row(
                    event_id=eid,
                    ts=base + datetime.timedelta(days=d, seconds=eid % 86400),
                    event_type="view",
                    user_id=eid % 50,
                )
            )
            eid += 1
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(drift.tables, "table", lambda *a: df)
    got = drift.page_hinkley_drift_query(spark, "_").orderBy("day").collect()
    assert all(r["alarm"] == 0 for r in got[:10])
    assert got[-1]["alarm"] == 1
    # the detector's alarm is monotone after the shift settles in
    first_alarm = next(i for i, r in enumerate(got) if r["alarm"] == 1)
    assert first_alarm >= 10
    assert all(r["alarm"] == 1 for r in got[first_alarm:])


# ---------------------------------------------------------------------------
# friedman_event_mix
# ---------------------------------------------------------------------------


def test_friedman_matches_bruteforce(spark):
    daily = defaultdict(Counter)
    for r in (
        tables.table(spark, SF, "events")
        .selectExpr("cast(ts as date) as day", "event_type")
        .collect()
    ):
        daily[r["day"]][r["event_type"]] += 1
    typs = sorted({t for c in daily.values() for t in c})
    n, k = len(daily), len(typs)
    r2 = Counter()
    a2 = 0
    for day, c in daily.items():
        vals = sorted(c.get(t, 0) for t in typs)
        groups = Counter(vals)
        mid2 = {}
        cum = 0
        for v in sorted(groups):
            g = groups[v]
            mid2[v] = 2 * cum + g + 1
            cum += g
        for t in typs:
            m2 = mid2[c.get(t, 0)]
            r2[t] += m2
            a2 += m2 * m2
    s4 = sum((r2[t] - n * (k + 1)) ** 2 for t in typs)
    denom4 = a2 - n * k * (k + 1) ** 2

    [row] = inference.friedman_event_mix_query(spark, SF).collect()
    assert row["n_blocks"] == n and row["k_treatments"] == k
    assert row["s4"] == s4
    assert row["denom4"] == denom4
    if denom4 > 0:
        assert row["chi2"] == pytest.approx((k - 1) * s4 / denom4, rel=1e-12)


def test_friedman_identical_ordering_maxes_chi2(spark, monkeypatch):
    """Blocks that rank the treatments identically every day push
    chi2 to its tie-free maximum n*(k-1); a shuffled-rank matrix sits
    near 0."""
    base = datetime.datetime(2025, 3, 1)
    rows = []
    eid = 0
    for d in range(10):
        for i, t in enumerate(("view", "click", "purchase")):
            for _ in range(10 * (i + 1)):  # stable ordering every day
                rows.append(
                    Row(event_id=eid, ts=base + datetime.timedelta(days=d),
                        event_type=t, user_id=eid % 7)
                )
                eid += 1
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(inference.tables, "table", lambda *a: df)
    [row] = inference.friedman_event_mix_query(spark, "_").collect()
    n, k = 10, 3
    assert row["chi2"] == pytest.approx(float(n * (k - 1)), rel=1e-12)


# ---------------------------------------------------------------------------
# wilcoxon_signed_rank
# ---------------------------------------------------------------------------


def test_wilcoxon_matches_bruteforce(spark):
    rows = (
        tables.table(spark, SF, "events")
        .selectExpr("user_id", "cast(ts as date) as day")
        .collect()
    )
    days = [r["day"] for r in rows]
    d0, d1 = min(days), max(days)
    span = (d1 - d0).days
    per = defaultdict(lambda: [0, 0])
    for r in rows:
        half = int((r["day"] - d0).days * 2 >= span + 1)
        per[r["user_id"]][half] += 1
    diffs = [y - x for x, y in per.values()]
    nz = [d for d in diffs if d != 0]
    groups = Counter(abs(d) for d in nz)
    mid2 = {}
    cum = 0
    for v in sorted(groups):
        mid2[v] = 2 * cum + groups[v] + 1
        cum += groups[v]
    w2p = sum(mid2[abs(d)] for d in nz if d > 0)
    w2m = sum(mid2[abs(d)] for d in nz if d < 0)
    n = len(nz)
    tie = sum(c**3 - c for c in groups.values())
    var12 = 2 * n * (n + 1) * (2 * n + 1) - tie

    [row] = inference.wilcoxon_signed_rank_query(spark, SF).collect()
    assert row["n_pairs"] == len(diffs)
    assert row["n_nonzero"] == n
    assert row["w2_plus"] == w2p
    assert row["w2_minus"] == w2m
    assert row["var12"] == var12
    if var12 > 0:
        z = (w2p - n * (n + 1) / 2) / ((var12 / 12.0) ** 0.5)
        assert row["z"] == pytest.approx(z, rel=1e-12)
    # rank-sum identity: W+ + W- covers every nonzero pair's rank
    assert w2p + w2m == sum(mid2[abs(d)] for d in nz)


def test_wilcoxon_detects_paired_shift(spark, monkeypatch):
    """Every user doubles activity in the second half -> all
    differences positive -> W- = 0 and z large positive; the paired
    design sees it even though each user's magnitude differs."""
    base = datetime.datetime(2025, 5, 1)
    rows = []
    eid = 0
    for u in range(40):
        for d in range(10):  # first half: 1 event/day
            rows.append(Row(event_id=eid, ts=base + datetime.timedelta(days=d),
                            event_type="view", user_id=u)); eid += 1
        for d in range(10, 20):  # second half: 2+u%3 events/day
            for _ in range(2 + u % 3):
                rows.append(Row(event_id=eid,
                                ts=base + datetime.timedelta(days=d),
                                event_type="view", user_id=u)); eid += 1
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(inference.tables, "table", lambda *a: df)
    [row] = inference.wilcoxon_signed_rank_query(spark, "_").collect()
    assert row["w2_minus"] == 0
    assert row["n_nonzero"] == 40
    assert row["z"] > 5.0
