"""Round-11 streaming twin: per-modality codec quarantine counters
maintained as state over a file stream of TIMG/TAUD containers (every
7th corrupted, the ``codec_audit`` recipe), asserted to CONVERGE to
the batch audit's aggregate over the same corpus (the A4
emit-per-update contract, streaming_sprt's harness)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from _kafka_streams_scaffold_spark import tables
from _kafka_streams_scaffold_spark.operators import codec
from _kafka_streams_scaffold_spark.streaming import (
    pipeline,
    serving,
    stateful,
)

SF = "/root/testdata/sf0.001"


def _write_jsonl(dirpath, name, rows, mtime):
    os.makedirs(dirpath, exist_ok=True)
    p = os.path.join(dirpath, name)
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(p, (mtime, mtime))


def test_streaming_codec_quarantine_converges_to_batch_audit(
    spark, tmp_path
):
    docs = [
        {"doc_id": int(r["doc_id"]), "text": r["text"]}
        for r in tables.table(spark, SF, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
        .collect()
    ]
    docs.sort(key=lambda r: r["doc_id"])
    mid = len(docs) // 2
    src = str(tmp_path / "src")
    _write_jsonl(src, "a.json", docs[:mid], 1_700_000_000)
    _write_jsonl(src, "b.json", docs[mid:], 1_700_000_001)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    # the exact codec_audit pipeline, minus the final column prune:
    # frame -> corrupt every 7th -> decode with quarantine
    coded = codec.with_coded_payload(stream)
    corrupted = coded.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.expr("substring(payload, 1, length(payload) - 1)"),
        ).otherwise(F.col("payload")).alias("payload"),
    )
    audited = codec.decode_audit(corrupted)

    store = serving.MemoryStore(["modality"])
    q = pipeline.run_update_into_store(
        stateful.streaming_codec_quarantine(audited),
        store,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    batch = codec.codec_audit_query(spark, SF).collect()
    want = {}
    for r in batch:
        m = r["modality"]
        w = want.setdefault(m, {"n_ok": 0, "n_quarantined": 0, "units": 0})
        if r["decode_ok"]:
            w["n_ok"] += 1
            w["units"] += r["n_units"]
        else:
            w["n_quarantined"] += 1
    got = {k[0]: v for k, v in store.snapshot().items()}
    assert set(got) == set(want)
    for m, w in want.items():
        assert got[m]["n_ok"] == w["n_ok"], m
        assert got[m]["n_quarantined"] == w["n_quarantined"], m
        assert got[m]["units_total"] == w["units"], m


def test_streaming_benford_converges_to_batch_audit(spark, tmp_path):
    from _kafka_streams_scaffold_spark.operators import dq

    amounts = [
        {"o_totalprice": float(r["o_totalprice"])}
        for r in tables.table(spark, SF, "orders")
        .select("o_totalprice")
        .collect()
    ]
    mid = len(amounts) // 2
    src = str(tmp_path / "src")
    _write_jsonl(src, "a.json", amounts[:mid], 1_700_000_000)
    _write_jsonl(src, "b.json", amounts[mid:], 1_700_000_001)

    schema = T.StructType(
        [T.StructField("o_totalprice", T.DoubleType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    # the batch op's exact stateless digit extraction on the stream
    digits = stream.filter(F.col("o_totalprice") >= 0.01).select(
        F.expr(
            "cast(substring(cast(cast(floor(o_totalprice * 100) as"
            " bigint) as string), 1, 1) as int)"
        ).alias("digit")
    )
    store = serving.MemoryStore(["digit"])
    q = pipeline.run_update_into_store(
        stateful.streaming_benford(digits),
        store,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {k[0]: v for k, v in store.snapshot().items()}
    batch = {r["digit"]: r for r in dq.benford_audit_query(spark, SF).collect()}
    assert set(got) == set(batch)
    for d, b in batch.items():
        g = got[d]
        assert g["n"] == b["n"], d
        # bit-equality: both sides run the identical IEEE double ops
        # over the same integer counts and literal expectations
        assert g["p_observed"] == b["p_observed"], d
        assert g["p_expected"] == b["p_expected"], d
        assert g["chi2_contrib"] == b["chi2_contrib"], d


def test_streaming_psi_converges_to_batch_score(spark, tmp_path):
    from _kafka_streams_scaffold_spark.operators import dq
    from _kafka_streams_scaffold_spark.operators.sketches import _BUCKET_EXPR

    ev = tables.table(spark, SF, "events")
    # the batch op derives the baseline boundary from the temporal
    # midpoint; the stream PINS the same boundary (the production
    # deployment stamps it from a training snapshot)
    mid = ev.selectExpr(
        "timestampadd(SECOND, cast(floor(timestampdiff(SECOND, min(ts),"
        " max(ts)) / 2) as bigint), min(ts)) as mid"
    ).collect()[0]["mid"]
    rows = [
        {"ts_us": int(r["ts"].timestamp() * 1_000_000), "value": float(r["value"])}
        for r in ev.select("ts", "value").collect()
    ]
    half = len(rows) // 2
    src = str(tmp_path / "src")
    _write_jsonl(src, "a.json", rows[:half], 1_700_000_000)
    _write_jsonl(src, "b.json", rows[half:], 1_700_000_001)

    schema = T.StructType(
        [
            T.StructField("ts_us", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    assigned = stream.select(
        (
            F.timestamp_micros(F.col("ts_us"))
            < F.lit(mid).cast("timestamp")
        ).alias("is_base"),
        F.expr(_BUCKET_EXPR).alias("bucket"),
    )
    store = serving.MemoryStore(["bucket"])
    q = pipeline.run_update_into_store(
        stateful.streaming_psi(assigned),
        store,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {k[0]: v for k, v in store.snapshot().items()}
    batch = {
        r["bucket"]: r
        for r in dq.psi_drift_score_query(spark, SF).collect()
    }
    assert set(got) == set(batch)
    for bkt, b in batch.items():
        g = got[bkt]
        assert g["n_baseline"] == b["n_baseline"], bkt
        assert g["n_current"] == b["n_current"], bkt
        # fixed-point BEFORE any sum: bit-equal across the Python/JVM
        # ln implementations on these magnitudes
        assert g["term_fp"] == b["term_fp"], bkt
        assert g["psi_contrib"] == b["psi_contrib"], bkt


def test_streaming_cmh_converges_to_batch_statistic(spark, tmp_path):
    from _kafka_streams_scaffold_spark.operators import inference

    ev = (
        tables.table(spark, SF, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(F.to_date("ts").alias("day"), "event_type", "value")
        .collect()
    )
    rows = [
        {
            "day": str(r["day"]),
            "is_click": r["event_type"] == "click",
            "is_high": r["value"] > 50.0,
        }
        for r in ev
    ]
    mid = len(rows) // 2
    src = str(tmp_path / "src")
    _write_jsonl(src, "a.json", rows[:mid], 1_700_000_000)
    _write_jsonl(src, "b.json", rows[mid:], 1_700_000_001)

    schema = T.StructType(
        [
            T.StructField("day", T.StringType()),
            T.StructField("is_click", T.BooleanType()),
            T.StructField("is_high", T.BooleanType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    store = serving.MemoryStore(["k"])
    q = pipeline.run_update_into_store(
        stateful.streaming_cmh(stream),
        store,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = store.snapshot()[("all",)]
    b = inference.cmh_event_value_query(spark, SF).collect()[0]
    assert got["n_strata"] == b["n_strata"]
    assert got["n_events"] == b["n_events"]
    assert got["sum_a"] == b["sum_a"]
    # bit-equality: identical IEEE ops in identical (day-sorted)
    # fold order over the same exact integer cells, and the integer
    # products sit far inside 2^53 where Python's float() conversion
    # equals the batch op's DECIMAL->double cast
    assert got["sum_e"] == b["sum_e"]
    assert got["sum_v"] == b["sum_v"]
    assert got["cmh"] == b["cmh"]


def test_streaming_durbin_watson_converges_to_batch(spark, tmp_path):
    from _kafka_streams_scaffold_spark.operators import stats

    days = [
        {"day": str(r["day"])}
        for r in tables.table(spark, SF, "orders")
        .select(F.to_date("o_orderdate").alias("day"))
        .collect()
    ]
    mid = len(days) // 2
    src = str(tmp_path / "src")
    _write_jsonl(src, "a.json", days[:mid], 1_700_000_000)
    _write_jsonl(src, "b.json", days[mid:], 1_700_000_001)

    schema = T.StructType([T.StructField("day", T.StringType())])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    store = serving.MemoryStore(["k"])
    q = pipeline.run_update_into_store(
        stateful.streaming_durbin_watson(stream),
        store,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = store.snapshot()[("all",)]
    b = stats.durbin_watson_daily_query(spark, SF).collect()[0]
    assert got["n_days"] == b["n_days"]
    assert got["total_orders"] == b["total_orders"]
    # exact integer moments, then the identical double-cast division
    assert got["dw_num"] == b["dw_num"]
    assert got["dw_den"] == b["dw_den"]
    assert got["dw"] == b["dw"]
