"""Degenerate-input sweep: run EVERY registered query against fully
empty (schema-correct) tables and report crashes.

The driver's correctness gate and the DuckDB oracle only ever see
healthy gate data; ANSI mode (division by zero, bad casts) means a
query that is bit-exact at every SF can still crash on a degenerate
partition of a 100 TB corpus — an empty source after a filter, a
class with one bucket, a day with no events. This sweep is the cheap
detector for that hazard class (it found the t-closeness,
blocking-recall, and budget-allocation guards).

    python tools/degenerate_sweep.py [--nulls | --tiny] [query ...]

Default mode serves fully EMPTY tables; ``--nulls`` instead serves
one row per table with every non-key column NULL (the
worst-row-in-a-healthy-partition case); ``--tiny`` serves one row
with every string truncated to ONE character and every array sliced
to ONE element — the shorter-than-any-window / single-token /
degenerate-vector case (it found the descending-sequence(1, 0)
crash in the bigram extractors). Exit code = number of crashing
queries. "Empty output" and "defined aggregate over nothing" are
both passes; only raised exceptions fail.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    from _kafka_streams_scaffold_spark import registry, session, tables

    spark = session.build_session(
        "degenerate-sweep", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")

    args = sys.argv[1:]
    nulls_mode = "--nulls" in args
    if nulls_mode:
        args.remove("--nulls")
    tiny_mode = "--tiny" in args
    if tiny_mode:
        args.remove("--tiny")

    # schema-correct degenerate twins of every table
    _KEYS = {  # keep join/id keys non-null so the row is reachable
        "region": ("r_regionkey",),
        "nation": ("n_nationkey", "n_regionkey"),
        "customer": ("c_custkey", "c_nationkey"),
        "supplier": ("s_suppkey", "s_nationkey"),
        "part": ("p_partkey",),
        "orders": ("o_orderkey", "o_custkey"),
        "lineitem": ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
        "events": ("event_id", "user_id"),
        "documents": ("doc_id",),
        "embeddings": ("vec_id",),
    }

    def degenerate(name: str):
        base = tables.table(spark, SF_DIR, name)
        if not (nulls_mode or tiny_mode):
            return base.limit(0).cache()
        from pyspark.sql import functions as F

        keep = _KEYS[name]
        if tiny_mode:
            cols = []
            for c, t in base.dtypes:
                if c in keep:
                    cols.append(F.col(c))
                elif t == "string":
                    cols.append(F.substring(F.col(c), 1, 1).alias(c))
                elif t.startswith("array"):
                    cols.append(F.slice(F.col(c), 1, 1).alias(c))
                else:
                    cols.append(F.col(c))
            # the loader's data-contract quarantine applies to synthetic
            # frames too (a truncated embedding is dropped, not served)
            return tables.quarantine(
                name, base.limit(1).select(*cols)
            ).cache()
        one = base.limit(1).select(
            *[
                F.col(c) if c in keep else F.lit(None).cast(t).alias(c)
                for c, t in base.dtypes
            ]
        )
        return tables.quarantine(name, one).cache()

    empty = {
        name: degenerate(name)
        for name in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    for df in empty.values():
        df.count()

    real_table = tables.table
    tables.table = lambda spark_, sf, name: empty[name]

    only = set(args)
    failures = []
    try:
        for name, fn in registry.queries().items():
            if only and name not in only:
                continue
            t0 = time.time()
            try:
                n = fn(spark, SF_DIR).count()
                print(f"OK    {name}: {n} rows [{time.time() - t0:.1f}s]", flush=True)
            except Exception as e:  # noqa: BLE001 - audit, report everything
                msg = str(e).split("\n")[0][:160]
                failures.append(name)
                print(f"CRASH {name}: {type(e).__name__}: {msg}", flush=True)
            finally:
                from _kafka_streams_scaffold_spark import pinning

                pinning.unpersist_all()
    finally:
        tables.table = real_table

    print(f"\n{len(failures)} crash(es)")
    for f in failures:
        print(f"  {f}")
    return len(failures)


if __name__ == "__main__":
    raise SystemExit(main())
