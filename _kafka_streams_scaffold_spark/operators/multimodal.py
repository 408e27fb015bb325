"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, batch iteration, partitioning) is
real and tested; the *codec* step is stubbed because this container
has no image/audio libraries: ``decode=fake`` derives deterministic
features from the raw bytes, ``decode=real`` raises
``NotImplementedError`` at the exact point a Pillow/librosa call
would slot in. Swapping in a real codec changes ONE function — the
dataflow, schema, and batch shape stay identical.

Scale notes:
- Payloads stay in executor Arrow batches end-to-end — never
  collected, never shuffled (all queries here are map-only; Catalyst
  prunes the payload column out of any downstream agg that doesn't
  need it).
- ``spark.sql.files.maxPartitionBytes`` (session.py) bounds how many
  payload bytes one task holds; for 100 MB-class videos you'd store
  pointers + range-read in the UDF instead of inline bytes.

The driver's tables have no binary column, so payloads are
synthesized as ``cast(text as binary)`` (UTF-8). Texts are ASCII, so
the DuckDB oracle reproduces every fake-decode feature with plain
string functions — the pandas-UDF path is value-checked, not just
schema-checked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, first_byte int, checksum string"
)
N_FRAMES = 4
FRAME_SCHEMA = "doc_id long, frame_id int, frame_bytes long, frame_checksum string"


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column + typed metadata. Null texts
    have no payload at all (no row): every downstream pandas UDF does
    ``bytes(payload)``, which raises on None — a null-payload record
    must never reach the codec tier."""
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _fake_features(doc_id: int, payload: bytes, modality: str) -> dict:
    return {
        "doc_id": doc_id,
        "modality": modality,
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "checksum": hashlib.md5(payload).hexdigest(),
    }


def decode_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode == "real":
                # Integration point for a real codec (e.g. PIL.Image.open
                # over io.BytesIO(payload)); not available in this env.
                raise NotImplementedError(
                    "real image/audio decoding requires codec libraries"
                )
            yield pd.DataFrame.from_records(
                [
                    _fake_features(d, bytes(p), m)
                    for d, p, m in zip(
                        pdf["doc_id"], pdf["payload"], pdf["modality"]
                    )
                ]
            )

    return df.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def multimodal_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_features(
        with_payload(tables.spread(tables.table(spark, sf_dir, "documents"), "doc_id"))
    )


MULTIMODAL_FEATURES_ORACLE = """
SELECT doc_id,
       'image' AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ascii(substring(text, 1, 1)) AS INTEGER) AS first_byte,
       md5(text) AS checksum
FROM documents
WHERE text IS NOT NULL
"""


def frame_sample(df: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """Video-style frame sampling: split each payload into n_frames
    contiguous chunks (deterministic fake of keyframe extraction),
    one output row per frame."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                for i in range(n_frames):
                    chunk = b[i * n // n_frames : (i + 1) * n // n_frames]
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_id": i,
                            "frame_bytes": len(chunk),
                            "frame_checksum": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame.from_records(out)

    return df.mapInPandas(_batches, schema=FRAME_SCHEMA)


def frame_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(with_payload(tables.spread(tables.table(spark, sf_dir, "documents"), "doc_id")))


FRAME_SAMPLE_ORACLE = f"""
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_id,
       CAST((i + 1) * n // {N_FRAMES} - i * n // {N_FRAMES} AS BIGINT) AS frame_bytes,
       md5(substring(text, i * n // {N_FRAMES} + 1,
                     (i + 1) * n // {N_FRAMES} - i * n // {N_FRAMES})) AS frame_checksum
FROM (SELECT doc_id, text, length(text) AS n FROM documents
      WHERE text IS NOT NULL),
     unnest(generate_series(0, {N_FRAMES - 1})) AS t(i)
"""


# --------------------------------------------------------------------------
# Resize (nearest-neighbor downsample over the payload byte stream)
# --------------------------------------------------------------------------

RESIZE_TARGET = 32  # output "pixels" (bytes) per payload
RESIZE_SCHEMA = (
    "doc_id long, n_bytes_in long, n_bytes_out long, resized_checksum string"
)


def resize_payload(df: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Deterministic fake of image resize: nearest-neighbor sampling
    of the 1-D byte stream to ``target`` bytes (out[i] =
    in[floor(i*n/target)]) — the exact dataflow of a thumbnail stage
    (read payload, emit fixed-size representation + checksum), with
    the interpolation kernel as the single function a real codec
    (PIL ``Image.resize``) would replace. Empty payloads resize to
    empty."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                rb = (
                    bytes(b[i * n // target] for i in range(target))
                    if n
                    else b""
                )
                out.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes_in": n,
                        "n_bytes_out": len(rb),
                        "resized_checksum": hashlib.md5(rb).hexdigest(),
                    }
                )
            yield pd.DataFrame.from_records(out)

    return df.mapInPandas(_batches, schema=RESIZE_SCHEMA)


def resize_payload_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_payload(
        with_payload(
            tables.spread(tables.table(spark, sf_dir, "documents"), "doc_id")
        )
    )


# ASCII payloads: byte positions == character positions, so the
# nearest-neighbor sample rebuilds with substring picks.
RESIZE_PAYLOAD_ORACLE = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes_in,
       CAST(CASE WHEN length(text) > 0 THEN {RESIZE_TARGET} ELSE 0 END
            AS BIGINT) AS n_bytes_out,
       CASE WHEN length(text) > 0 THEN
         md5(array_to_string(
           [substring(text, (i * length(text)) // {RESIZE_TARGET} + 1, 1)
            for i in generate_series(0, {RESIZE_TARGET - 1})], ''))
       ELSE md5('') END AS resized_checksum
FROM documents
WHERE text IS NOT NULL
"""
