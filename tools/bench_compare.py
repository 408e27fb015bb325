"""Compare two bench JSON files (bench.py output lines) and flag
per-query movement — the round-over-round regression check the
BENCH_r{N}.json 4KB-tail truncation used to make impossible.

    python tools/bench_compare.py BENCH_full_prev.json BENCH_full_latest.json
    python tools/bench_compare.py BENCH_r04.json BENCH_full_latest.json

Accepts either a bare JSON object file or a driver artifact whose
LAST line parses as the JSON object (the driver keeps a stdout tail,
so older rounds may only have a partial "queries" map — comparison
then covers the intersection and says so).

Interpretation discipline (see the bench-hygiene notes in
ARCHITECTURE.md): registry reordering moves shared warm-up costs
between queries, so verify any flagged regression SOLO (3 runs, warm
session) before treating it as real.
"""

from __future__ import annotations

import json
import sys

FLAG_RATIO = 1.3  # the driver's own regression threshold
MIN_SECONDS = 0.5  # ignore ratio noise on sub-half-second queries


def load(path: str) -> dict:
    text = open(path).read().strip()
    try:
        obj = json.loads(text)
        if "queries" in obj:
            return obj
        if isinstance(obj.get("tail"), str):
            # driver artifact: {"n":..., "sf":..., "tail": "<stdout tail>"}
            text = obj["tail"]
        else:
            text = json.dumps(obj)
    except json.JSONDecodeError:
        pass
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    # Driver artifacts keep only a stdout TAIL, so the object's head
    # (and some queries) may be cut off mid-line: recover whatever
    # "name": seconds pairs survive. "sf"/"value" pairs regex-match
    # too; drop the known non-query keys.
    import re

    pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9.]+)', text)
    queries = {
        k: float(v)
        for k, v in pairs
        if k not in {"value", "sf"}
    }
    if not queries:
        raise SystemExit(f"no JSON object or timing pairs found in {path}")
    m = re.search(r'"value":\s*([0-9.]+)', text)
    return {
        "value": float(m.group(1)) if m else None,
        "queries": queries,
        "partial": True,
    }


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    prev, cur = load(sys.argv[1]), load(sys.argv[2])
    pq, cq = prev.get("queries", {}), cur.get("queries", {})
    common = sorted(set(pq) & set(cq))
    only_prev, only_cur = sorted(set(pq) - set(cq)), sorted(set(cq) - set(pq))
    print(
        f"total: {prev.get('value')}s -> {cur.get('value')}s over "
        f"{len(pq)} -> {len(cq)} visible queries ({len(common)} comparable)"
    )
    # Ambient-normalized aggregate (r10 verdict ask #7): bench.py runs
    # a fixed calibration job before and after the sweep; the mean
    # calibration ratio between the two files estimates how much of a
    # raw aggregate delta is HOST STATE rather than code. Normalizing
    # by it turns the round-vs-round table into one command instead of
    # the hand-written BASELINE.md protocol. Single-query verdicts
    # still require the solo re-run discipline — calibration measures
    # the host, not a particular plan's sensitivity to it.
    def _cal(d: dict) -> float | None:
        vals = [
            d.get("calibration_first_sec"), d.get("calibration_last_sec")
        ]
        vals = [v for v in vals if isinstance(v, (int, float))]
        return sum(vals) / len(vals) if vals else None

    pc, cc = _cal(prev), _cal(cur)
    p_common = sum(pq[n] for n in common)
    c_common = sum(cq[n] for n in common)
    if common and p_common > 0:
        raw = c_common / p_common
        line = (
            f"common-query aggregate: {p_common:.1f}s -> {c_common:.1f}s "
            f"(raw {raw:.2f}x"
        )
        if pc and cc:
            ambient = cc / pc
            line += (
                f", calibration {pc:.2f}s -> {cc:.2f}s = {ambient:.2f}x "
                f"ambient, ambient-normalized {raw / ambient:.2f}x"
            )
        else:
            line += ", no calibration fields in one input — raw only"
        print(line + ")")
    regressions, improvements = [], []
    for name in common:
        a, b = pq[name], cq[name]
        if b > a * FLAG_RATIO and b >= MIN_SECONDS:
            regressions.append((b / max(a, 1e-9), name, a, b))
        elif a > b * FLAG_RATIO and a >= MIN_SECONDS:
            improvements.append((a / max(b, 1e-9), name, a, b))
    for tag, rows in (("REGRESSION", regressions), ("improved", improvements)):
        for ratio, name, a, b in sorted(rows, reverse=True):
            print(f"{tag:>10}  {name}: {a:.2f}s -> {b:.2f}s ({ratio:.2f}x)")
    if only_cur:
        print(f"new (no baseline): {', '.join(only_cur)}")
    if only_prev:
        print(f"dropped from view: {', '.join(only_prev)}")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
