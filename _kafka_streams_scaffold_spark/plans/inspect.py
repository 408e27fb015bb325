"""Physical-plan assertions used by tests and scale audits.

These parse ``df.explain("formatted")`` output — the same thing a
human checks by eye — so regressions in pushdown/broadcast/pruning
fail tests instead of silently costing a full scan at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def tree(df: DataFrame, elide_cached: bool = True) -> str:
    """Just the numbered plan tree (formatted explain repeats every
    node header in the details section — counting on the full string
    double-counts). Cached-relation BUILD plans are elided: formatted
    explain inlines the full child tree under every InMemoryRelation,
    so a query composing several pinned artifacts would repeat each
    artifact's plan at every reference (measured 21k lines for
    dedup_tier_agreement) — the artifact's own plan is audited where
    it is built. Pass ``elide_cached=False`` to keep the expansions
    (plan tests that count scans THROUGH a pinned artifact need
    them)."""
    text = explain_str(df).split("\n\n", 1)[0]
    if not elide_cached:
        return text
    out: list[str] = []
    skip_deeper_than: int | None = None
    for line in text.split("\n"):
        stripped = line.lstrip(" :+-*")
        indent = len(line) - len(stripped)
        if skip_deeper_than is not None:
            # Cached AQE sub-blocks (== Final Plan == fragments) reset
            # to all-space prefixes at arbitrary depth; a line only
            # returns to the OUTER tree if it is shallower than the
            # relation AND still carries the outer ':' continuation
            # art in its prefix (or sits at the un-arted root).
            outer = indent <= skip_deeper_than and (
                ":" in line[:skip_deeper_than] or indent <= 3
            )
            if not outer:
                continue
            skip_deeper_than = None
        out.append(line)
        if "InMemoryRelation" in line:
            skip_deeper_than = indent
            out.append(
                " " * (indent + 6)
                + "+- ... (cached build plan elided; see the "
                "artifact's own entry)"
            )
    return "\n".join(out)
