"""Generic failed-UDF skip policy (R1 general form): an ARBITRARY
exploding function drops only the poison rows, routes them to the
quarantine frame with provenance, and a stream keeps processing
batches after the failure — mirroring ``ReplaceThreadTests.java:
124-166`` (moo / quack / moo moo moo, stream survives, later oinks
still flow)."""

from __future__ import annotations

import json
import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from _kafka_streams_scaffold_spark.functions import resilience
from _kafka_streams_scaffold_spark.streaming import serving


@resilience.failsafe(T.StringType())
def _shouty(text):
    if text is not None and "quack" in text.lower():
        raise RuntimeError("QUACK encountered")  # arbitrary user failure
    return text.upper()


def test_failsafe_batch_drops_only_poison_rows(spark):
    df = spark.createDataFrame(
        [
            Row(offset=0, text="moo"),
            Row(offset=1, text="moo moo"),
            Row(offset=2, text="quack"),
            Row(offset=3, text="moo moo moo"),
            Row(offset=4, text=None),
        ]
    )
    good, bad = resilience.apply_failsafe(df, "value", _shouty, "text")
    good_rows = {r["offset"]: r["value"] for r in good.collect()}
    bad_rows = bad.collect()
    # None.upper() raises AttributeError -> also quarantined, not fatal.
    assert good_rows == {0: "MOO", 1: "MOO MOO", 3: "MOO MOO MOO"}
    assert {r["offset"] for r in bad_rows} == {2, 4}
    by_off = {r["offset"]: r[resilience.ERROR_COL] for r in bad_rows}
    assert by_off[2].startswith("RuntimeError")
    assert by_off[4].startswith("AttributeError")
    # Quarantine keeps every original column (provenance/metadata).
    assert set(bad.columns) == {"offset", "text", resilience.ERROR_COL}


def test_failsafe_stream_survives_poison_and_continues(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)

    def write(name, texts):
        with open(os.path.join(src, name), "w") as f:
            for t in texts:
                f.write(json.dumps({"text": t}) + "\n")

    # Batch 1-3 via maxFilesPerTrigger=1; the poison sits mid-stream.
    write("a.json", ["moo", "moo moo"])
    write("b.json", ["quack"])
    write("c.json", ["moo moo moo", "oink"])

    schema = T.StructType([T.StructField("text", T.StringType())])
    lines = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )

    store = serving.MemoryStore(["text"])
    dead_letters: list[dict] = []

    def handle(batch_df, batch_id):
        good, bad = resilience.apply_failsafe(
            batch_df, "value", _shouty, "text"
        )
        store.upsert_batch(good, batch_id)
        dead_letters.extend(r.asDict() for r in bad.collect())

    q = (
        lines.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {k[0]: v["value"] for k, v in store.snapshot().items()}
    # Records BEFORE and AFTER the poison batch were processed: the
    # stream survived the failure (thread-replacement parity).
    assert got == {
        "moo": "MOO",
        "moo moo": "MOO MOO",
        "moo moo moo": "MOO MOO MOO",
        "oink": "OINK",
    }
    assert [d["text"] for d in dead_letters] == ["quack"]
    assert dead_letters[0][resilience.ERROR_COL].startswith("RuntimeError")


def test_failsafe_multi_arg_and_expression_inputs(spark):
    @resilience.failsafe(T.DoubleType())
    def _ratio(a, b):
        return a / b  # ZeroDivisionError on b == 0

    df = spark.createDataFrame(
        [Row(x=10.0, y=2.0), Row(x=1.0, y=0.0), Row(x=9.0, y=3.0)]
    )
    good, bad = resilience.apply_failsafe(
        df, "ratio", _ratio, F.col("x"), F.col("y")
    )
    assert {(r["x"], r["ratio"]) for r in good.collect()} == {
        (10.0, 5.0),
        (9.0, 3.0),
    }
    assert [r["y"] for r in bad.collect()] == [0.0]
