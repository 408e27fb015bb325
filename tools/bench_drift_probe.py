"""Root-cause probe for the round-8 canonical-bench drift.

Round-over-round, the 306 common queries regressed 19% (r07 377.0 s ->
r08 448.7 s, median per-query ratio 1.159) with NO code change to the
regressed queries — the suspect is session-level accumulation in the
single bench JVM as the registry grew 306 -> 381 (pin/cache eviction
churn, codegen cache growth, GC pressure), not plan damage.

This probe separates the two hypotheses directly: in ONE JVM with the
exact bench warmup, it times a fixed target set (the five largest r08
regressions + two controls that improved) at three session positions:

  early  — right after warmup (what a solo/fresh-JVM measurement sees)
  mid    — after running the first half of the registry bench-style
  late   — after running the full registry (what BENCH_full sees for
           late-positioned queries)

If early ~= r07 numbers and late ~= r08 numbers, the regression is
harness accumulation and the fix is bench segmentation (fresh JVM per
segment), not operator work. Writes one JSON line to stdout and
BENCH_DRIFT_PROBE.json.

Run: python tools/bench_drift_probe.py  (~20 min at sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _kafka_streams_scaffold_spark import pinning, session  # noqa: E402
from _kafka_streams_scaffold_spark import registry  # noqa: E402

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


def _run_one(spark, fn) -> float:
    t0 = time.time()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    pinning.unpersist_all()
    return round(dt, 3)


def main() -> None:
    spark = session.build_session("bench-drift-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = list(qs)

    # bench.py's exact warmup sequence
    next(iter(qs.values()))(spark, SF_DIR).count()
    cores = spark.sparkContext.defaultParallelism
    spark.range(cores).repartition(cores).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    from _kafka_streams_scaffold_spark.operators import similarity as _sim
    from _kafka_streams_scaffold_spark.operators import dedup as _dd
    from _kafka_streams_scaffold_spark.operators import lm as _lm

    for w in (
        _sim.ann_topk_query, _sim.ivf_assign_query,
        _dd.simhash_pairs_query, _lm.kneser_ney_bigram_query,
    ):
        w(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    pinning.unpersist_all()

    out: dict[str, dict[str, float]] = {t: {} for t in TARGETS}

    def measure(tag: str) -> None:
        for t in TARGETS:
            out[t][tag] = _run_one(spark, qs[t])

    measure("early")

    # Burn through the registry bench-style to accumulate session
    # state; skip the targets themselves (measured separately) so the
    # 'mid'/'late' tags reflect position, not an extra warm run.
    half = len(names) // 2
    for name in names[:half]:
        if name in TARGETS:
            continue
        _run_one(spark, qs[name])
    measure("mid")

    for name in names[half:]:
        if name in TARGETS:
            continue
        _run_one(spark, qs[name])
    measure("late")

    payload = {
        "metric": "bench_drift_probe",
        "sf_dir": SF_DIR,
        "targets": out,
        "r07_canonical": {
            "knn_triangles": 6.43, "revenue_cube": 2.41,
            "detector_mcnemar": 4.50, "dup_graph_degrees": 3.17,
            "bulk_part_suppliers": 2.28, "ann_hubness_audit": 5.36,
            "kcenter_coreset": 2.54,
        },
        "r08_canonical": {
            "knn_triangles": 11.17, "revenue_cube": 5.10,
            "detector_mcnemar": 6.90, "dup_graph_degrees": 4.99,
            "bulk_part_suppliers": 4.08, "ann_hubness_audit": 4.00,
            "kcenter_coreset": 1.40,
        },
    }
    line = json.dumps(payload)
    with open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_DRIFT_PROBE.json"),
        "w",
    ) as fh:
        fh.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
