"""Oracle-output type audit: the regression gate for the round-1
failure class where DuckDB widened integer aggregates to HUGEINT and
the driver's value hash diverged from Spark's BIGINT even though the
values were equal. Every oracle's result schema must stay inside the
types both engines serialize identically."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from _kafka_streams_scaffold_spark import tables

SF_DIR = "/root/testdata/sf0.001"

# Types with identical value serialization on both engines.
_FORBIDDEN = {"HUGEINT", "UHUGEINT", "INT128"}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in tables.TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    return con


def test_no_oracle_emits_hugeint(duck):
    offenders = []
    for name, sql in entry.oracle_sql().items():
        rel = duck.sql(sql)
        for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
            if str(typ).upper() in _FORBIDDEN:
                offenders.append((name, col, str(typ)))
    assert not offenders, (
        "un-cast integer aggregate(s) — wrap in CAST(... AS BIGINT): "
        f"{offenders}"
    )


def test_every_query_has_an_oracle_except_documented_rows_only(duck):
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = set(qs) - set(oracles)
    # lsh_ann: approximate recall by design (recall gate IS checked);
    # payload_chunks_cdc: rolling hash not SQL-expressible (contract
    # in test_chunking.py; fixed-size sibling fully hash-checked)
    assert missing == {"lsh_ann", "payload_chunks_cdc"}
    assert set(oracles) <= set(qs)  # no orphan oracles
