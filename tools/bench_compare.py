"""Compare the two most recent same-sf bench runs in BENCH/history.jsonl,
weather-normalized by the per-run calibration, and flag per-query
regressions.

    python tools/bench_compare.py [sf] [threshold]
"""

from __future__ import annotations

import json
import os
import sys

HIST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "BENCH", "history.jsonl")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 1.3
    rows = [json.loads(l) for l in open(HIST) if l.strip()]
    same = [r for r in rows if abs(float(r.get("sf", -1)) - sf) < 1e-9]
    if len(same) < 2:
        print(f"only {len(same)} run(s) at sf={sf}; nothing to compare")
        return
    prev, cur = same[-2], same[-1]

    def norm(run):
        cal = float(run.get("calibration_sec") or 0) or None
        nom = float(run.get("calibration_nominal_sec") or 0) or None
        scale = (nom / cal) if (cal and nom) else 1.0
        return {q: w * scale for q, w in run.get("queries", {}).items()}, scale

    pq, ps = norm(prev)
    cq, cs = norm(cur)
    print(f"prev wall {prev['value']}s (cal x{ps:.2f})  "
          f"cur wall {cur['value']}s (cal x{cs:.2f})")
    shared = sorted(set(pq) & set(cq))
    regressions = []
    for q in shared:
        if pq[q] >= 0.3 and cq[q] > pq[q] * thresh:
            regressions.append((cq[q] / pq[q], q, pq[q], cq[q]))
    new = sorted(set(cq) - set(pq))
    if new:
        print("new queries:", ", ".join(f"{q} ({cq[q]:.2f}s)" for q in new))
    if not regressions:
        print(f"no weather-normalized regressions > {thresh}x "
              f"(among {len(shared)} shared queries >= 0.3s)")
        return
    print(f"REGRESSIONS (> {thresh}x normalized):")
    for ratio, q, a, b in sorted(regressions, reverse=True):
        print(f"  {q}: {a:.2f}s -> {b:.2f}s ({ratio:.2f}x)")


if __name__ == "__main__":
    main()
