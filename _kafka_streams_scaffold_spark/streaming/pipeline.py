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
    output_mode: str = "update",
) -> StreamingQuery:
    """Materialize a streaming aggregate into a serving store:
    update-mode foreachBatch upsert, availableNow trigger (process all
    pending input, then stop — the batch-parity harness; in production
    drop the trigger for continuous micro-batches).

    ``output_mode``: session-window aggregations reject update mode
    (merging sessions would have to retract previously-emitted rows);
    pass "complete" for those — the upsert sink is idempotent per key
    so re-emitting the full state converges to the same store."""
    return (
        agg.writeStream.outputMode(output_mode)
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


def run_append_with_record_audit(
    df: DataFrame,
    path: str,
    audit_path: str,
    checkpoint_dir: str,
    application_id: str,
    query_name: str = "append-audited",
) -> StreamingQuery:
    """Append sink PLUS the per-record audit trail (R4 strict parity):
    each micro-batch writes the payload to ``path`` and one audit
    envelope per record (``audit.audit_records``) to ``audit_path``.

    Structured Streaming allows one sink per query, so the fan-out is
    a ``foreachBatch`` writing both. foreachBatch is at-least-once (a
    crash between the two writes replays the batch), so each write is
    made IDEMPOTENT: output is partitioned by the deterministic batch
    id and written with dynamic partition overwrite — a replayed batch
    overwrites exactly its own partition instead of appending
    duplicates. Net effect: exactly-once per sink."""
    from .audit import audit_records

    def _write_both(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for frame, dest in (
                (batch_df, path),
                (audit_records(batch_df, application_id), audit_path),
            ):
                (
                    frame.withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(dest)
                )
        finally:
            batch_df.unpersist()

    return (
        df.writeStream.outputMode("append")
        .foreachBatch(_write_both)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins; duplicate
    arrivals within the watermark horizon are dropped and per-key state
    is evicted once the watermark passes it — bounded state at any
    scale (the streaming counterpart of the batch ``exact_dedup``).

    For content dedup pass a fingerprint column (e.g.
    ``textops.fingerprint_expr()``) as the key — never the raw text:
    the dedup state then stores 32 hex chars per doc."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def streaming_corpus_filter(
    docs: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of the batch ``corpus_keep`` curation gate: the
    stateless tier (quality score, language ID, fingerprint) runs as
    the SAME column expressions the batch queries use — one semantics,
    two execution modes — and content dedup is first-arrival-wins on
    the normalized fingerprint within the watermark horizon
    (``dropDuplicatesWithinWatermark``; the streaming stand-in for the
    batch min-doc-id canonical representative).

    Scale: scoring is scan-local (zero state); the only streaming
    state is the dedup store keyed by 32-hex digests, evicted as the
    watermark passes — bounded regardless of corpus size. Benchmark
    decontamination joins in as a stream-static broadcast upstream if
    needed (``enrich_with_dimension``)."""
    from ..operators.curation import KEEP_LANG, MIN_QUALITY
    from ..operators.textops import (
        fingerprint_expr,
        pred_lang_expr,
        quality_score_expr,
    )

    scored = (
        docs.withColumn("quality_score", quality_score_expr())
        .withColumn("pred_lang", pred_lang_expr())
        .withColumn("fingerprint", fingerprint_expr())
    )
    kept = scored.filter(
        (F.col("quality_score") >= MIN_QUALITY)
        & (F.col("pred_lang") == KEEP_LANG)
    )
    return streaming_dedup(
        kept, ["fingerprint"], ts_col=ts_col, watermark=watermark
    )


def enrich_with_dimension(
    stream_df: DataFrame, dim_df: DataFrame, on: list[str] | str
) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (small)
    dimension snapshot. Broadcast by construction — no stream-side
    shuffle, no state; the dimension re-resolves per batch so slowly
    changing dims pick up updates."""
    return stream_df.join(F.broadcast(dim_df), on, "left")


def clicks_with_recent_purchase(
    clicks: DataFrame,
    purchases: DataFrame,
    join_horizon: str = "1 hour",
    watermark: str = "2 hours",
    join_type: str = "inner",
) -> DataFrame:
    """Stream-stream join: click events matched to purchases by the
    same user within the preceding ``join_horizon``. Both sides buffer
    keyed state; the watermark + time-range condition bound how long a
    row waits for its match, so state is evicted and the join is
    append-mode emittable (SURVEY.md §2.8 gap: the reference has no
    joins at all).

    ``join_type="leftOuter"`` additionally emits clicks that found NO
    purchase — but only once the watermark passes their horizon (the
    engine must prove no future match can arrive before it emits the
    null row), so unmatched results trail the matched ones by the
    watermark delay."""
    c = clicks.withWatermark("ts", watermark).alias("c")
    p = purchases.withWatermark("ts", watermark).alias("p")
    return c.join(
        p,
        F.expr(
            "c.user_id = p.user_id AND "
            f"p.ts BETWEEN c.ts - INTERVAL {join_horizon} AND c.ts"
        ),
        join_type,
    ).select(
        F.col("c.user_id").alias("user_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("p.value").alias("purchase_value"),
    )


def streaming_hll_registers(events: DataFrame) -> DataFrame:
    """Streaming twin of ``operators/sketches.hll_user_sketch``: the
    HLL register table maintained as STREAMING STATE. Register update
    is ``max`` — algebraic — so the per-(type, register) state is one
    int that partial-merges map-side and runs in ``update`` output
    mode; the state store literally IS the sketch (at most
    |types| x HLL_M rows however many events stream through), and any
    snapshot of it yields the same estimate the batch operator
    computes over the events seen so far. The deterministic md5 hash
    chain is byte-identical to the batch side, so convergence is
    EXACT register equality, not approximate agreement — the A3/A4
    emit-per-update contract extended to the sketch tier."""
    from ..operators.sketches import _hll_registers

    reg, rank = _hll_registers("spark")
    h60 = (
        "cast(conv(substring(md5(concat('hll:',"
        " cast(user_id as string))), 1, 15), 16, 10) as bigint)"
    )
    return (
        events.select("event_type", F.expr(h60).alias("h"))
        .select(
            "event_type", F.expr(reg).alias("r"), F.expr(rank).alias("k")
        )
        .groupBy("event_type", "r")
        .agg(F.max("k").alias("mk"))
    )


def streaming_sequence_counts(events: DataFrame) -> DataFrame:
    """Streaming twin of ``operators/dq.sequence_gap_audit_query``'s
    state: per-event_id copy counts maintained as streaming state.

    The batch audit's one-row form needs ``count(DISTINCT event_id)``,
    which streaming aggregation cannot maintain incrementally — but
    the per-id count table CAN (algebraic ``count``, update output
    mode, A4 emit-per-update: every micro-batch re-emits exactly the
    ids it touched). The audit scalars are then pure arithmetic over
    the converged state (``sequence_gap_summary``): n_distinct is the
    key count, n_rows the copy sum, min/max the key range — identical
    values to the batch query over the same records, which is what
    the twin test pins. Per-key state is one bigint; at 100 TB the
    store is RocksDB and this audit sits on the same changelog the
    offset-audit tier replays (reference offset audit:
    services/src/main/java/io/confluent/services/AuditService.java)."""
    return events.groupBy("event_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("copies")
    )


def sequence_gap_summary(store) -> dict:
    """Fold a converged per-event_id store (from
    ``streaming_sequence_counts``) into the sequence-gap audit row —
    the SAME arithmetic as dq.sequence_gap_audit_query: n_missing is
    the id-range holes, n_dup the at-least-once leakage."""
    snap = store.snapshot()
    if not snap:
        return {
            "n_rows": 0, "min_id": None, "max_id": None,
            "n_missing": None, "n_dup": 0,
        }
    ids = [k[0] for k in snap]
    n_rows = sum(v["copies"] for v in snap.values())
    mn, mx, nd = min(ids), max(ids), len(ids)
    return {
        "n_rows": n_rows,
        "min_id": mn,
        "max_id": mx,
        "n_missing": mx - mn + 1 - nd,
        "n_dup": n_rows - nd,
    }


def streaming_latest(events: DataFrame) -> DataFrame:
    """Changelog/KTable view of a keyed stream: latest record per key
    (the streaming twin of ``operators/changelog.ktable_latest_query``;
    reference KTable semantics, `streams/PurchasesTopology.java:57`).

    `max_by` over the total (ts, event_id) order is an algebraic
    aggregate, so unlike a row_number window it partial-merges
    map-side and runs in `update` output mode with per-key state of
    exactly one record — the streaming state store literally IS the
    KTable."""
    order = F.struct("ts", "event_id")
    return events.groupBy("user_id").agg(
        F.max_by(F.struct("ts", "event_type", "value"), order).alias("latest")
    ).select(
        "user_id",
        F.col("latest.ts").alias("last_ts"),
        F.col("latest.event_type").alias("last_type"),
        F.col("latest.value").alias("last_value"),
    )


def run_apply_changes(
    changes: DataFrame, store, checkpoint: str
):
    """Continuously apply a CDC stream (rows carrying a ``change``
    column: insert/update/delete) into a changelog store — the
    streaming consumer of the ``snapshot_diff`` family. Deletes
    become tombstones (``ParquetChangelogStore.apply_cdc_batch``);
    the checkpoint makes re-delivered batches idempotent at the
    store's latest-wins read (same batch id -> same rows win).

    Input contract: inserts/updates must carry the FULL row payload
    (the ``snapshot_diff(..., payload=True)`` /
    ``snapshot_diff_full_query`` shape) — the keys-only diff is an
    audit artifact and would upsert NULL-valued rows; tombstones need
    only the key. Each batch must carry at most one change per key
    (snapshot diffs guarantee this); within a batch the read breaks
    same-key ties in favor of the tombstone."""
    return (
        changes.writeStream.foreachBatch(
            lambda df, bid: store.apply_cdc_batch(df, bid)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_ivm_deltas(deltas: DataFrame) -> DataFrame:
    """Streaming twin of ``operators/temporal.ivm_join_revenue_query``:
    the KTable-style maintainer of the per-nation join view, fed the
    SIGNED DELTA ROWS the bilinear rule produces
    (``temporal.ivm_pieces`` — one (c_nationkey, w, cents) row per
    affected join pair across dA JOIN B, A JOIN dB, dA JOIN dB).

    The aggregation is algebraic (two signed sums), so streaming
    update mode maintains it incrementally with one (bigint, bigint)
    state per nation — the reference's continuously-updated KTable
    aggregate (streams/PurchasesTopology.java:62-66) applied to a
    JOIN view, which is exactly what Kafka Streams' foreign-key join
    + aggregate composition materializes. The twin test proves
    V_old + converged(delta stream) == the batch view == a full
    recompute — the bilinear maintenance identity holding IN-ENGINE
    across micro-batch boundaries and a checkpoint restart.

    At 100 TB the delta stream is the CDC feed (churn-sized, not
    corpus-sized); state is |nations| rows."""
    return deltas.groupBy("c_nationkey").agg(
        F.sum("w").cast("bigint").alias("dp"),
        F.sum(F.col("w") * F.col("cents")).cast("bigint").alias("dr"),
    )
