"""Solo benchmark of the dedup-audit chain with bench.py's keep-scope
semantics (verdict r09 ask #3's before/after measurement)."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from _kafka_streams_scaffold_spark import pinning, session  # noqa: E402
import __spark_entry__ as e  # noqa: E402

CHAIN = [
    "dedup_tier_agreement",
    "dedup_token_savings",
    "source_dedup_matrix",
    "minhash_estimate_audit",
    "blocking_recall_audit",
    "detector_kappa",
    "detector_mcnemar",
    "dup_capture_recapture",
    "detector_cochran_q",
    "kendall_w_detectors",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = session.build_session("chain-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    timings: dict[str, float] = {}
    t_all = time.time()
    for i, name in enumerate(CHAIN):
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        if i + 1 < len(CHAIN):
            pinning.unpersist_all(
                keep=lambda k: isinstance(k, tuple)
                and str(k[0]).startswith("dedup.")
            )
        else:
            pinning.unpersist_all()
    print(json.dumps({"total": round(time.time() - t_all, 3),
                      "queries": timings}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
