"""Audit trail (SURVEY.md §2.7 R3/R4).

The reference's consumer interceptors emit (a) per-partition offset
records to an ``audit-offsets`` topic (``FailProofInterceptor.java:
19-113``) and (b) per-record JSON envelopes ``{timestamp, client
{applicationId, type}, record{partition, topic, offset, timestamp}}``
(``AuditConsumerInterceptor.java:42-58``).

Structured Streaming's checkpoint already provides durable offset
tracking; this listener reproduces the *observable* audit feed at
micro-batch granularity: one envelope per source per batch, carrying
the exact offset ranges processed. Envelopes go to an in-memory ring
and optionally a JSONL file (in production: a Kafka audit topic via a
small producer in ``onQueryProgress``)."""

from __future__ import annotations

import json
import time

from pyspark.sql.streaming import StreamingQueryListener


class AuditListener(StreamingQueryListener):
    def __init__(self, application_id: str, jsonl_path: str | None = None):
        self.application_id = application_id
        self.jsonl_path = jsonl_path
        self.envelopes: list[dict] = []

    # -- envelope builder (AuditConsumerInterceptor.java:42-58 parity) --
    def _envelope(self, progress) -> dict:
        return {
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

    def onQueryProgress(self, event) -> None:
        env = self._envelope(event.progress)
        self.envelopes.append(env)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(env, default=str) + "\n")

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass
