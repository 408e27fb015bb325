"""Content-defined + fixed chunking contracts.

The CDC chunker cannot be oracle-checked (rolling hash is not
SQL-expressible), so its semantics are pinned here instead:
determinism, full coverage, length bounds, and the property that
justifies its existence — boundary re-synchronization after an edit,
which fixed-size chunking provably lacks.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from _kafka_streams_scaffold_spark.operators import chunking


def _payload(doc_id: int, data: bytes):
    return Row(doc_id=doc_id, payload=bytearray(data))


def test_cdc_boundaries_cover_and_bound():
    import random

    rng = random.Random(7)
    for n in (0, 1, chunking.CDC_MIN, 1000, 5000):
        data = bytes(rng.randrange(256) for _ in range(n))
        cuts = chunking.cdc_boundaries(data)
        if n == 0:
            assert cuts == []
            continue
        assert cuts[-1] == n, "chunks must cover the payload"
        prev = 0
        for c in cuts:
            assert c > prev
            assert c - prev <= chunking.CDC_MAX
            prev = c
        # all chunks except possibly the last respect the minimum
        lens = [b - a for a, b in zip([0] + cuts, cuts)]
        assert all(
            ln >= chunking.CDC_MIN for ln in lens[:-1]
        ) or len(lens) == 1


def test_cdc_boundaries_deterministic():
    data = b"the quick brown fox " * 100
    assert chunking.cdc_boundaries(data) == chunking.cdc_boundaries(data)


def test_cdc_resynchronizes_after_prefix_edit():
    """THE content-defined property: prepend bytes and all but the
    first few chunks keep their digests (cuts re-align on content).
    Fixed-size chunking shares ~zero digests after the same edit —
    measured here as the contrast."""
    import random

    rng = random.Random(13)
    data = bytes(rng.randrange(256) for _ in range(4000))
    edited = b"XYZ" + data

    def digests(d: bytes) -> list[str]:
        cuts = chunking.cdc_boundaries(d)
        out, s = [], 0
        for c in cuts:
            out.append(hashlib.md5(d[s:c]).hexdigest())
            s = c
        return out

    orig, new = digests(data), digests(edited)
    shared = set(orig) & set(new)
    assert len(shared) >= 0.8 * len(orig), (
        f"CDC must re-synchronize: only {len(shared)}/{len(orig)} "
        "chunk digests survived a 3-byte prefix edit"
    )

    def fixed_digests(d: bytes) -> list[str]:
        B = chunking.CHUNK_BYTES
        return [
            hashlib.md5(d[i : i + B]).hexdigest()
            for i in range(0, len(d), B)
        ]

    f_shared = set(fixed_digests(data)) & set(fixed_digests(edited))
    assert len(f_shared) <= 0.1 * len(orig), (
        "fixed-size chunking should NOT survive a prefix shift; if it "
        "does, the contrast this test documents is wrong"
    )


def test_cdc_spark_rollup_matches_local(spark):
    docs = spark.createDataFrame(
        [
            _payload(1, b"hello world " * 50),
            _payload(2, b"hello world " * 50),  # exact dup of 1
            _payload(3, b"completely different content " * 40),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in chunking.payload_chunks_cdc(docs).groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("length").alias("total"),
        ).collect()
    }
    for doc_id, data in ((1, b"hello world " * 50), (3, b"completely different content " * 40)):
        cuts = chunking.cdc_boundaries(data)
        assert out[doc_id]["n"] == len(cuts)
        assert out[doc_id]["total"] == len(data)
    # duplicate payloads chunk identically
    rows = chunking.payload_chunks_cdc(docs).collect()
    d1 = sorted((r["chunk_idx"], r["digest"]) for r in rows if r["doc_id"] == 1)
    d2 = sorted((r["chunk_idx"], r["digest"]) for r in rows if r["doc_id"] == 2)
    assert d1 == d2


def test_fixed_chunker_counts(spark, sf_dir):
    from _kafka_streams_scaffold_spark import tables

    rows = chunking.payload_chunks_fixed_query(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in tables.table(spark, sf_dir, "documents").collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        text = docs[r["doc_id"]]
        expect = (len(text.encode()) - 1) // chunking.CHUNK_BYTES + 1
        assert r["n_chunks"] == expect
        assert 0 <= r["n_dup_chunks"] <= r["n_chunks"]
