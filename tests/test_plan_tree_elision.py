"""Unit tests for plans.inspect.tree() cached-block elision on captured
formatted-explain fixtures (r09 ADVICE: the codegen-star resume guard
matched '* ' but Spark renders codegen nodes as '*(n) ...' with no
space, so the belt never fired)."""

from __future__ import annotations

from _kafka_streams_scaffold_spark.plans import inspect as pi


def _with_plan(monkeypatch, text: str) -> str:
    monkeypatch.setattr(pi, "explain_str", lambda _df: text)
    return pi.tree(object())


def test_codegen_starred_cached_block_does_not_resume(monkeypatch):
    """A cached block printed in simple format can place a
    whole-stage-codegen line ('*(1) Project ...') at the exact column
    layout of the outer tree's resume point (single open branch, so
    the ':' pattern check is vacuous). The star prefix must keep the
    skip alive; the tree resumes only at the real sibling."""
    plan = "\n".join(
        [
            "== Physical Plan ==",
            "SortMergeJoin (10)",
            ":- InMemoryTableScan (1)",
            ":     +- InMemoryRelation (2)",
            "+- *(1) Project [a]",
            "   +- Scan parquet (0)",
            "+- Sort (9)",
            "   +- Exchange (8)",
        ]
    )
    t = _with_plan(monkeypatch, plan)
    assert "*(1) Project" not in t
    assert "Scan parquet (0)" not in t
    assert "Sort (9)" in t
    assert "Exchange (8)" in t
    assert "cached build plan elided" in t


def test_plain_sibling_still_resumes(monkeypatch):
    """The star guard must not swallow legitimate resume lines."""
    plan = "\n".join(
        [
            "== Physical Plan ==",
            "HashAggregate (5)",
            ":- InMemoryTableScan (1)",
            ":     +- InMemoryRelation (2)",
            ":           +- Filter (3)",
            "+- Exchange (4)",
        ]
    )
    t = _with_plan(monkeypatch, plan)
    assert "Filter (3)" not in t
    assert "Exchange (4)" in t


def test_elide_cached_false_keeps_everything(monkeypatch):
    plan = "\n".join(
        [
            "== Physical Plan ==",
            ":- InMemoryRelation (2)",
            "+- *(1) Project [a]",
        ]
    )
    monkeypatch.setattr(pi, "explain_str", lambda _df: plan)
    t = pi.tree(object(), elide_cached=False)
    assert "*(1) Project" in t


def test_star_space_rendering_keeps_skip_alive(monkeypatch):
    """r10 ADVICE: on this Spark build, executed/cached plans inline
    in formatted style as '* Node (id)' (star+SPACE), not only the
    simple-format '*(n) Node'. The bare-star prefix guard must treat
    both renderings as cached-block lines so the skip stays alive
    until the real plain sibling."""
    plan = "\n".join(
        [
            "== Physical Plan ==",
            "SortMergeJoin (10)",
            ":- InMemoryTableScan (1)",
            ":     +- InMemoryRelation (2)",
            "+- * Project (3)",
            "   +- * ColumnarToRow (4)",
            "      +- Scan parquet (0)",
            "+- Sort (9)",
            "   +- Exchange (8)",
        ]
    )
    t = _with_plan(monkeypatch, plan)
    assert "* Project (3)" not in t
    assert "ColumnarToRow (4)" not in t
    assert "Scan parquet (0)" not in t
    assert "Sort (9)" in t
    assert "Exchange (8)" in t
