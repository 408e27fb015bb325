"""Streaming topologies: the reference's three applications under
Structured Streaming, sharing the *same* column expressions as the
batch operators (one semantics, two execution modes).

Emission contract (SURVEY.md §2.4 A4): the reference emits one update
per record (cache disabled); Spark emits one update per key per
micro-batch. Both converge to the same key -> value state, which is
what the reference's own tests assert (``readKeyValuesToMap``,
``WordCountTopologyTest.java:46-52``) — so tests here compare
converged serving-store state against the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import mapvalues, purchases, wordcount
from .serving import foreach_batch_upsert


def streaming_wordcount(lines: DataFrame, text_col: str = "text") -> DataFrame:
    """WordCount topology (``WordCountTopology.java:29-36``), streaming:
    running per-word counts, updated each micro-batch."""
    return wordcount.wordcount(lines, text_col)


def streaming_purchases(events: DataFrame) -> DataFrame:
    """Purchases topology (``PurchasesTopology.java:57-70``), streaming."""
    return purchases.aggregate_count_and_total(
        purchases.select_compound_key(events)
    )


def streaming_uppercase(values: DataFrame, value_col: str = "text") -> DataFrame:
    """Uppercase + poison-pill skip (``main/Uppercase.java:28-39``)."""
    return mapvalues.uppercase(values, value_col)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window with late-data watermark — the
    streaming form of the batch ``events_hourly`` query. State for
    windows older than the watermark is dropped, bounding memory at
    any scale."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows — streaming counterpart of the batch
    gaps-and-islands ``user_sessions`` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("session_events"))
        .select(
            F.col("user_id"),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "session_events",
        )
    )


def run_update_into_store(
    agg: DataFrame,
    store,
    checkpoint_dir: str,
    query_name: str = "serving",
) -> StreamingQuery:
    """Materialize a streaming aggregate into a serving store:
    update-mode foreachBatch upsert, availableNow trigger (process all
    pending input, then stop — the batch-parity harness; in production
    drop the trigger for continuous micro-batches)."""
    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(foreach_batch_upsert(store))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )


def run_append_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    query_name: str = "append",
) -> StreamingQuery:
    """Stateless append sink (the ``.to(topic)`` analog for files)."""
    return (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
