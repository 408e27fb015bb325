"""TIMG/TAUD toy-container codec: the real decode path that replaced
the round-1..10 multimodal ``NotImplementedError`` stub (r10 verdict
ask #5). Local math is pytest-pinned here; decoded-content values are
oracle-checked registry-wide through ``codec_moments``/``codec_audit``.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark.operators import codec, multimodal


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


# ---- pure codec math --------------------------------------------------------


def test_timg_roundtrip_truncates_to_whole_rows():
    payload = codec.encode_timg(b"abcdefghijABCDEFGHIJ")  # 20B -> h=2, 16 px
    modality, w, h, units = codec.decode_units(payload)
    assert (modality, w, h) == ("image", 8, 2)
    assert units.tolist() == [ord(c) for c in "abcdefghijABCDEF"]
    assert units.dtype == np.int64


def test_taud_roundtrip_int16_le_pairs():
    payload = codec.encode_taud(b"abcd")
    modality, w, h, units = codec.decode_units(payload)
    assert (modality, w, h) == ("audio", 0, 0)
    # int16 LE: 'ab' -> 97 + 256*98, 'cd' -> 99 + 256*100
    assert units.tolist() == [97 + 256 * 98, 99 + 256 * 100]


def test_header_only_containers_decode_empty():
    for payload in (codec.encode_timg(b"short"), codec.encode_taud(b"x")):
        _m, _w, _h, units = codec.decode_units(payload)
        assert units.size == 0


def test_unknown_magic_and_length_mismatch_raise():
    with pytest.raises(ValueError, match="unknown codec magic"):
        codec.decode_units(b"JPEG....")
    with pytest.raises(ValueError, match="TIMG body"):
        codec.decode_units(codec.encode_timg(b"abcdefgh")[:-1])
    with pytest.raises(ValueError, match="TAUD body"):
        codec.decode_units(codec.encode_taud(b"abcd")[:-1])


def test_header_only_survives_one_byte_truncation():
    """The codec_audit oracle's subtle branch: dropping the last byte
    of a HEADER-ONLY container removes the zero high byte of the
    unit-count field, which still parses as 0 units and passes the
    0 == 0 body check."""
    for payload in (codec.encode_timg(b"short"), codec.encode_taud(b"x")):
        _m, _w, _h, units = codec.decode_units(payload[:-1])
        assert units.size == 0


# ---- Spark plumbing ---------------------------------------------------------


def test_codec_moments_values(spark):
    df = codec.decode_moments(
        codec.with_coded_payload(_docs(spark, ["abcdefghij", "abcd", None]))
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(rows) == {0, 1}  # null text never enters the codec tier
    img = rows[0]  # even id -> image, 8 of 10 bytes kept
    px = [ord(c) for c in "abcdefgh"]
    assert (img["modality"], img["width"], img["height"]) == ("image", 8, 1)
    assert img["n_units"] == 8
    assert img["unit_sum"] == sum(px)
    assert img["unit_sq_sum"] == sum(v * v for v in px)
    assert (img["unit_min"], img["unit_max"]) == (min(px), max(px))
    aud = rows[1]  # odd id -> audio, 2 samples
    s = [97 + 256 * 98, 99 + 256 * 100]
    assert (aud["modality"], aud["n_units"]) == ("audio", 2)
    assert aud["unit_sum"] == sum(s)
    assert aud["unit_sq_sum"] == sum(v * v for v in s)


def test_codec_moments_empty_body_sentinels(spark):
    df = codec.decode_moments(codec.with_coded_payload(_docs(spark, ["ab"])))
    row = df.collect()[0]  # even id image, len 2 < width -> 0 pixels
    assert row["n_units"] == 0 and row["unit_sum"] == 0
    assert (row["unit_min"], row["unit_max"]) == (-1, -1)


def test_decode_audit_quarantines_not_raises(spark):
    coded = codec.with_coded_payload(_docs(spark, ["abcdefghij", "abcdef"]))
    corrupted = coded.select(
        "doc_id",
        F.when(
            F.col("doc_id") == 0,
            F.expr("substring(payload, 1, length(payload) - 1)"),
        ).otherwise(F.col("payload")).alias("payload"),
    )
    rows = {r["doc_id"]: r for r in codec.decode_audit(corrupted).collect()}
    assert rows[0]["decode_ok"] is False
    assert "TIMG body" in rows[0]["err"]
    assert rows[0]["n_units"] == -1
    assert rows[1]["decode_ok"] is True and rows[1]["n_units"] == 3


def test_multimodal_real_decode_now_routes_to_codec(spark):
    """decode="real" no longer raises NotImplementedError — it calls
    the real codec, which rejects this module's UNFRAMED payloads
    with the unknown-magic error (containerized data goes through
    codec.with_coded_payload instead)."""
    out = multimodal.decode_features(
        multimodal.with_payload(_docs(spark, ["abc"])), decode="real"
    )
    with pytest.raises(Exception, match="unknown codec magic"):
        out.collect()


def test_codec_query_plans_are_map_only(spark):
    """The PLANS.md property: the codec tier is pure data parallelism
    — no join, no aggregate shuffle. The only allowed Exchange is
    tables.spread's small-input round-robin fan-out (a no-op on a
    cluster-scale scan)."""
    from _kafka_streams_scaffold_spark.operators import codec as c
    from _kafka_streams_scaffold_spark.plans import inspect as pi

    for q in (c.codec_moments_query, c.codec_audit_query):
        t = pi.tree(q(spark, "/root/testdata/sf0.001"))
        assert "Join" not in t and "Aggregate" not in t, t
        exchanges = [ln for ln in t.splitlines() if "Exchange" in ln]
        assert len(exchanges) <= 1, t
        assert all("RoundRobin" in ln or "Exchange (" in ln for ln in exchanges)


# ---- property-based invariants (pure Python/NumPy, no Spark) ----------------


from hypothesis import given, settings
from hypothesis import strategies as st

_BYTES = st.binary(max_size=200)


@settings(max_examples=200, deadline=None)
@given(_BYTES)
def test_prop_timg_roundtrip_recovers_whole_row_prefix(data):
    m, w, h, units = codec.decode_units(codec.encode_timg(data))
    assert (m, w) == ("image", codec.IMG_WIDTH)
    assert h == len(data) // codec.IMG_WIDTH
    assert bytes(units.astype(np.uint8).tobytes()) == data[: w * h]


@settings(max_examples=200, deadline=None)
@given(_BYTES)
def test_prop_taud_roundtrip_recovers_samples(data):
    m, _w, _h, units = codec.decode_units(codec.encode_taud(data))
    n = len(data) // 2
    assert m == "audio" and units.size == n
    assert units.tobytes() == np.frombuffer(
        data[: 2 * n], dtype="<i2"
    ).astype(np.int64).tobytes()


@settings(max_examples=200, deadline=None)
@given(_BYTES, st.booleans())
def test_prop_one_byte_truncation_quarantines_iff_body_nonempty(data, img):
    payload = codec.encode_timg(data) if img else codec.encode_taud(data)
    n_units = (
        len(data) // codec.IMG_WIDTH * codec.IMG_WIDTH if img
        else len(data) // 2
    )
    if n_units == 0:
        # header-only: the dropped byte is the zero high byte of the
        # unit-count field — still parses as an empty container (the
        # codec_audit oracle's subtle branch)
        _m, _w, _h, units = codec.decode_units(payload[:-1])
        assert units.size == 0
    else:
        import pytest as _pytest

        with _pytest.raises(ValueError):
            codec.decode_units(payload[:-1])


@settings(max_examples=100, deadline=None)
@given(_BYTES)
def test_prop_moments_row_matches_numpy(data):
    row = codec._moments_row(7, codec.encode_timg(data))
    px = np.frombuffer(data[: len(data) // 8 * 8], dtype=np.uint8).astype(
        np.int64
    )
    assert row["n_units"] == px.size
    if px.size:
        assert row["unit_sum"] == int(px.sum())
        assert row["unit_sq_sum"] == int((px * px).sum())
        assert (row["unit_min"], row["unit_max"]) == (
            int(px.min()), int(px.max()),
        )
    else:
        assert (row["unit_min"], row["unit_max"]) == (-1, -1)
