"""Root-cause probe for the round-8 canonical-bench drift.

Round-over-round, the 306 common queries regressed 19% (r07 377.0 s ->
r08 448.7 s, median per-query ratio 1.159) with NO code change to the
regressed queries — the suspect was session-level accumulation in the
single bench JVM as the registry grew 306 -> 381 (pin/cache eviction
churn, codegen cache growth, GC pressure), not plan damage.

Design (v2 — the v1 probe measured all three positions in ONE JVM, so
'mid'/'late' were warm re-runs of the targets and excluded the
first-touch compile cost that bench.py's cold-first timings include;
that conflated warmth with position): one FRESH JVM per session
position, each measuring the target set COLD — exactly bench.py's
per-query condition — after burning a different amount of the
registry bench-style first:

  early — warmup, then targets          (a solo/fresh-JVM measurement)
  mid   — warmup, first half of the registry, then targets
  late  — warmup, the whole registry, then targets (the bench-order
          condition for late-registered queries)

If cold-late >> cold-early, session accumulation is real. If
cold-late ~= cold-early ~= the canonical bench numbers, the
round-over-round drift is ambient. Writes BENCH_DRIFT_PROBE.json.

Run: python tools/bench_drift_probe.py   (~35 min at sf0.1; spawns
one subprocess per position). A single position can be run directly
with DRIFT_POSITION={early,mid,late}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The five largest r08 common-query regressions (r07 -> r08 canonical
# seconds) plus two improvements as controls.
TARGETS = [
    "knn_triangles",        # 6.43 -> 11.17
    "revenue_cube",         # 2.41 -> 5.10
    "detector_mcnemar",     # 4.50 -> 6.90
    "dup_graph_degrees",    # 3.17 -> 4.99
    "bulk_part_suppliers",  # 2.28 -> 4.08
    "ann_hubness_audit",    # control: 5.36 -> 4.00 (improved)
    "kcenter_coreset",      # control: 2.54 -> 1.40 (improved)
]

_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_DRIFT_PROBE.json",
)


def _run_position(position: str) -> None:
    from _kafka_streams_scaffold_spark import pinning, registry, session

    spark = session.build_session(f"bench-drift-{position}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = list(qs)

    def run_one(fn) -> float:
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        pinning.unpersist_all()
        return round(dt, 3)

    # bench.py's exact warmup sequence
    next(iter(qs.values()))(spark, SF_DIR).count()
    cores = spark.sparkContext.defaultParallelism
    spark.range(cores).repartition(cores).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    from _kafka_streams_scaffold_spark.operators import dedup as _dd
    from _kafka_streams_scaffold_spark.operators import lm as _lm
    from _kafka_streams_scaffold_spark.operators import similarity as _sim

    for w in (
        _sim.ann_topk_query, _sim.ivf_assign_query,
        _dd.simhash_pairs_query, _lm.kneser_ney_bigram_query,
    ):
        w(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    pinning.unpersist_all()

    # Burn session state bench-style, skipping the targets so their
    # measurement below is their FIRST (cold) execution in this JVM —
    # the same condition bench.py times.
    burn = {"early": 0, "mid": len(names) // 2, "late": len(names)}[position]
    for name in names[:burn]:
        if name in TARGETS:
            continue
        run_one(qs[name])

    timings = {t: run_one(qs[t]) for t in TARGETS}

    data = {}
    if os.path.exists(_OUT):
        with open(_OUT) as fh:
            data = json.load(fh)
    data.setdefault("metric", "bench_drift_probe_v2")
    data["sf_dir"] = SF_DIR
    data.setdefault("positions", {})[position] = timings
    data["r07_canonical"] = {
        "knn_triangles": 6.43, "revenue_cube": 2.41,
        "detector_mcnemar": 4.50, "dup_graph_degrees": 3.17,
        "bulk_part_suppliers": 2.28, "ann_hubness_audit": 5.36,
        "kcenter_coreset": 2.54,
    }
    data["r08_canonical"] = {
        "knn_triangles": 11.17, "revenue_cube": 5.10,
        "detector_mcnemar": 6.90, "dup_graph_degrees": 4.99,
        "bulk_part_suppliers": 4.08, "ann_hubness_audit": 4.00,
        "kcenter_coreset": 1.40,
    }
    with open(_OUT, "w") as fh:
        json.dump(data, fh)
    print(position, json.dumps(timings))
    spark.stop()


def main() -> None:
    position = os.environ.get("DRIFT_POSITION")
    if position:
        _run_position(position)
        return
    # Fresh JVM per position so each measurement is cold-first.
    if os.path.exists(_OUT):
        os.remove(_OUT)
    for pos in ("early", "mid", "late"):
        subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "DRIFT_POSITION": pos},
            check=True,
        )
    with open(_OUT) as fh:
        print(fh.read())


if __name__ == "__main__":
    main()
