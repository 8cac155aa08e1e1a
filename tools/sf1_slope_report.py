#!/usr/bin/env python
"""Compare the sf1 full-suite bench against the sf0.1 detail: per-query
decade slope = (warm_sf1 - overhead) / (warm_sf01 - overhead), both
overhead-adjusted (clamped at a 50 ms floor so noise-floor queries
don't divide by ~0). Linear = ~10x; prints every query sorted by slope
and flags > SUPERLINEAR_AT (default 13x — 10x data plus scheduling
slack on 32 fixed cores).

Fixed-cost-dominated entries (streaming replays, driver-loop training)
legitimately sit far BELOW 10x; those prove fixed-vs-data split, not a
problem. The flag list is what needs eyes.

Usage: python tools/sf1_slope_report.py [sf1_detail] [sf01_detail]
Writes BENCH_SF1_SLOPES.json next to the inputs.
"""

from __future__ import annotations

import json
import os
import sys

SUPERLINEAR_AT = 13.0
FLOOR = 0.05


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "BENCH_SF1_DETAIL.json"
    )
    sf01_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, "BENCH_DETAIL.json"
    )
    with open(sf1_path) as fh:
        sf1 = json.load(fh)
    with open(sf01_path) as fh:
        sf01 = json.load(fh)
    o1 = sf1.get("action_overhead_sec", 0.0)
    o0 = sf01.get("action_overhead_sec", 0.0)
    w1, w0 = sf1["queries_warm"], sf01["queries_warm"]
    rows = []
    for name in sorted(set(w1) & set(w0)):
        a1 = max(w1[name] - o1, FLOOR)
        a0 = max(w0[name] - o0, FLOOR)
        rows.append(
            {
                "query": name,
                "sf0.1_adj_sec": round(a0, 3),
                "sf1_adj_sec": round(a1, 3),
                "slope": round(a1 / a0, 2),
            }
        )
    rows.sort(key=lambda r: -r["slope"])
    flagged = [r for r in rows if r["slope"] > SUPERLINEAR_AT]
    out = {
        "superlinear_at": SUPERLINEAR_AT,
        "flagged": flagged,
        "n_queries": len(rows),
        "sf1_noisy": sf1.get("run_quality", {}).get("noisy"),
        "sf01_noisy": sf01.get("run_quality", {}).get("noisy"),
        "sf1_total_warm_adjusted": sf1.get("total_warm_adjusted"),
        "sf01_total_warm_adjusted": sf01.get("total_warm_adjusted"),
        "slopes": rows,
    }
    out_path = os.path.join(repo, "BENCH_SF1_SLOPES.json")
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    for r in rows[:15]:
        print(r)
    print(f"... {len(rows)} queries; flagged>{SUPERLINEAR_AT}x:"
          f" {[r['query'] for r in flagged]}")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
