"""Python UDTFs (Spark 4 user-defined TABLE functions) — the lateral
row-expanding escape hatch.

A UDTF is the right tool when one input row fans out into a variable
number of STRUCTURED rows and the expansion logic needs Python (state
machines, third-party parsers) — the territory between a column
expression (explode/transform, always prefer it when expressible) and
a full mapInPandas (which gives up per-row lateral semantics).

The demo UDTF here deliberately implements something the SQL surface
CAN express (sentence splitting with per-sentence stats), so the
pytest proves the UDTF path row-for-row equal to the
posexplode/split expression — the same "escape hatch, not a fork"
contract the stateful-streaming and multimodal tiers follow. Analyze-
time schema is static; the class carries no cross-row state, so Spark
is free to parallelize arbitrarily.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

MIN_SENTENCE_CHARS = 10  # matches line_dedup's line rules


@udtf(returnType="sentence_idx int, sentence string, n_words int")
class SplitSentences:
    """Lateral expansion of a text into trimmed period-delimited
    sentences (>= MIN_SENTENCE_CHARS kept) with a per-sentence word
    count."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        idx = 0
        for raw in text.split("."):
            s = raw.strip()
            if len(s) < MIN_SENTENCE_CHARS:
                continue
            yield idx, s, len(s.split())
            idx += 1


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``SELECT ... FROM
    split_sentences(...)`` or LATERAL JOIN)."""
    spark.udtf.register("split_sentences", SplitSentences)
