"""Engine-independent deterministic hashing, built on md5.

Spark's native ``xxhash64``/``hash`` and DuckDB's ``hash`` are
different functions, so any operator whose *output* depends on hash
values (minhash signatures, simhash bits, LSH buckets) uses md5 —
available and identical in both engines — reduced to integers.

``hash60(expr, seed)``: 60-bit integer from the first 15 hex chars of
``md5(seed || ':' || expr)``. 15 hex chars keep the value well inside
int64 on both engines. Spark reduces hex via ``conv``; DuckDB casts a
``0x``-prefixed literal. Verified bit-identical cross-engine.

Performance note: md5 is ~3-5x slower than xxhash64 but still
JVM-side, vectorizable, and shuffle-free — the cost is per-token
hashing, dwarfed by the shuffle the signatures feed. For pipelines
that don't need cross-engine reproducibility, swap in xxhash64 via
``fast=True``.
"""

from __future__ import annotations


def hash60_spark(expr: str, seed: int, fast: bool = False) -> str:
    if fast:
        return f"xxhash64({seed}, {expr})"
    return (
        f"cast(conv(substring(md5(concat('{seed}:', {expr})), 1, 15), 16, 10)"
        " as bigint)"
    )


def hash60_duck(expr: str, seed: int) -> str:
    return f"CAST('0x' || substring(md5('{seed}:' || {expr}), 1, 15) AS BIGINT)"
