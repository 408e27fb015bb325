"""Audit trail (SURVEY.md §2.7 R3/R4).

The reference's consumer interceptors emit (a) per-partition offset
records to an ``audit-offsets`` topic (``FailProofInterceptor.java:
19-113``) and (b) per-record JSON envelopes ``{timestamp, client
{applicationId, type}, record{partition, topic, offset, timestamp}}``
(``AuditConsumerInterceptor.java:42-58``). On startup the interceptor
replays the audit topic from the beginning up to the END OFFSETS
CAPTURED AT START (``FailProofInterceptor.java:88-110``; the bounded
variant at ``InterceptorTests.java:186-204`` polls until a marker
reaches the pre-read end offset), reconstructing the last-known
offsets map.

Structured Streaming's checkpoint already provides durable offset
tracking; this listener reproduces the *observable* audit feed at
micro-batch granularity: one envelope per source per batch, carrying
the exact offset ranges processed. Envelopes go to an in-memory ring
and optionally a JSONL file (in production: a Kafka audit topic via a
small producer in ``onQueryProgress``). ``replay_offsets`` is the
startup read-back: bounded by the file size observed at call time —
the filesystem analog of the end-offsets-bounded poll — it rebuilds
``last_offsets`` so a restarted listener knows exactly where every
source's audit trail left off.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

AUDIT_CLIENT_TYPE = "spark-structured-streaming"


def audit_records(df: DataFrame, application_id: str) -> DataFrame:
    """PER-RECORD audit envelopes (R4 strict parity): one envelope per
    record, shaped exactly like the reference's per-record interceptor
    output ``{timestamp, client{applicationId, type}, record{partition,
    topic, offset, timestamp}}`` (``AuditConsumerInterceptor.java:
    27-58``) — the batch-granular ``AuditListener`` above covers R3;
    this closes the per-record variant.

    Input contract: the frame carries the transport metadata columns
    (``sources.kafka.METADATA_COLS`` — topic/partition/offset/
    timestamp), which ``decode_kv`` preserves. The envelope timestamp
    is the processing wall-clock (``current_timestamp()``, evaluated
    per batch), mirroring the interceptor's ``System
    .currentTimeMillis()``. Works on batch and streaming frames alike;
    purely column-level, so it runs JVM-side with zero extra state —
    at 100 TB the audit sink costs one projection.
    """
    return df.select(
        F.unix_millis(F.current_timestamp()).alias("timestamp"),
        F.struct(
            F.lit(application_id).alias("applicationId"),
            F.lit(AUDIT_CLIENT_TYPE).alias("type"),
        ).alias("client"),
        F.struct(
            F.col("partition").cast("int").alias("partition"),
            F.col("topic").cast("string").alias("topic"),
            F.col("offset").cast("long").alias("offset"),
            F.col("timestamp").alias("timestamp"),
        ).alias("record"),
    )


def audit_records_json(df: DataFrame, application_id: str) -> DataFrame:
    """The envelopes as one JSON string column ``value`` — the shape a
    Kafka audit-topic producer (``encode_kv``-style) writes."""
    env = audit_records(df, application_id)
    return env.select(
        F.to_json(F.struct("timestamp", "client", "record")).alias("value")
    )


class AuditListener(StreamingQueryListener):
    def __init__(
        self,
        application_id: str,
        jsonl_path: str | None = None,
        replay: bool = True,
    ):
        self.application_id = application_id
        self.jsonl_path = jsonl_path
        self.envelopes: list[dict] = []
        # (applicationId, source description) -> {endOffset, batchId}
        self.last_offsets: dict[tuple[str, str], dict] = {}
        if replay and jsonl_path and os.path.exists(jsonl_path):
            self.replay_offsets()

    # -- envelope builder (AuditConsumerInterceptor.java:42-58 parity) --
    def _envelope(self, progress) -> dict:
        env = {
            "timestamp": int(time.time() * 1000),
            "client": {
                "applicationId": self.application_id,
                "type": "spark-structured-streaming",
            },
            "record": {
                "queryId": str(progress.id),
                "batchId": progress.batchId,
                "numInputRows": progress.numInputRows,
                "sources": [
                    {
                        "description": s.description,
                        "startOffset": s.startOffset,
                        "endOffset": s.endOffset,
                        "numInputRows": s.numInputRows,
                    }
                    for s in progress.sources
                ],
            },
        }
        # Round-trip through JSON so the in-memory form is identical to
        # what a replay reads back (offsets may arrive as non-JSON
        # types; default=str is the serialization rule either way).
        return json.loads(json.dumps(env, default=str))

    def _track(self, env: dict) -> None:
        for s in env["record"]["sources"]:
            self.last_offsets[(env["client"]["applicationId"], s["description"])] = {
                "endOffset": s["endOffset"],
                "batchId": env["record"]["batchId"],
            }

    def replay_offsets(self) -> int:
        """Bounded startup read-back (R3 replay parity): reconstruct
        the last-offsets map from the envelopes present *now*. The
        byte size observed at call time is the end-offset bound — a
        concurrently-appending writer never extends the replay, just
        as the reference's poll loop stops at the end offsets it read
        before polling. Returns the number of envelopes replayed."""
        end = os.path.getsize(self.jsonl_path)
        n = 0
        with open(self.jsonl_path) as f:
            for line in f.read(end).splitlines():
                if not line.strip():
                    continue
                self._track(json.loads(line))
                n += 1
        return n

    def onQueryProgress(self, event) -> None:
        env = self._envelope(event.progress)
        self.envelopes.append(env)
        self._track(env)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(env) + "\n")

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass
