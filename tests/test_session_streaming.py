"""Streaming session-window coverage: converged session state must
match hand-computed sessions, and the session_window gap semantics
must agree with the batch gaps-and-islands formulation on data away
from the exact-gap boundary (session_window closes at ts + gap while
the batch rule keeps diff == gap open — documented difference)."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from _kafka_streams_scaffold_spark.streaming import pipeline, serving


def _write_json(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def test_session_windows_merge_and_split(spark, tmp_path):
    evs = [
        # user 1: two events 10 min apart -> ONE session; then a 40-min
        # silence (> 30-min gap) -> a second session
        {"ts": "2024-01-01T00:00:00", "user_id": 1},
        {"ts": "2024-01-01T00:10:00", "user_id": 1},
        {"ts": "2024-01-01T00:50:00", "user_id": 1},
        # user 2: single event -> one 1-event session
        {"ts": "2024-01-01T00:05:00", "user_id": 2},
    ]
    src = str(tmp_path / "src")
    # split across two files -> two micro-batches; sessions must merge
    # across batches through the state store
    _write_json(src, "a.json", evs[:2])
    _write_json(src, "b.json", evs[2:])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    agg = pipeline.session_windows(stream, gap="30 minutes")
    store = serving.MemoryStore(["user_id", "session_start"])
    q = pipeline.run_update_into_store(
        agg, store, str(tmp_path / "ckpt"), output_mode="complete"
    )
    q.awaitTermination(120)
    got = {
        (k[0], str(k[1])): v["session_events"]
        for k, v in store.snapshot().items()
    }
    assert got == {
        (1, "2024-01-01 00:00:00"): 2,
        (1, "2024-01-01 00:50:00"): 1,
        (2, "2024-01-01 00:05:00"): 1,
    }
