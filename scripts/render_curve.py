"""Render BENCH_SCALING_CURVE.json as the BASELINE.md table + pair stats.

Two throughput estimators per level:
  * loop  — n_edges * supersteps / total loop_sec (includes any
    hypervisor-steal stalls that landed inside the window);
  * steady — n_edges / min(step_walls): the best superstep the level
    achieved.  Same rationale as membw_probe's max-of-reps: steal can
    only ADD wall time, so the minimum step is the least-contaminated
    observation of what the hardware+engine pair can actually do.

Pairs are reported for both estimators.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_SCALING_CURVE.json")
    d = json.load(open(path))
    levels = sorted(d["levels"].items(), key=lambda kv: int(kv[0]))
    rows = {}
    print("| cores | setup s | loop s | loop Me/s | steady Me/s | steady /core | min step s |")
    print("|---|---|---|---|---|---|---|")
    for k, v in levels:
        c = int(k)
        n = v["n_edges"]
        steady = n / (min(v["step_walls_ms"]) / 1000.0)
        rows[c] = {"loop": v["edges_per_sec"], "steady": steady}
        print(
            f"| {c} | {v['setup_sec']:.0f} | {v['loop_sec']:.0f} | "
            f"{v['edges_per_sec'] / 1e6:.2f} | {steady / 1e6:.2f} | "
            f"{steady / c / 1e6:.3f} | {min(v['step_walls_ms']) / 1000:.1f} |"
        )
    print()
    print("| pair | loop eff | steady eff |")
    print("|---|---|---|")
    for lo in sorted(rows):
        hi = lo * 4
        if hi in rows:
            le = rows[hi]["loop"] / rows[lo]["loop"] / 4
            se = rows[hi]["steady"] / rows[lo]["steady"] / 4
            print(f"| {lo}→{hi} | {le:.3f} | {se:.3f} |")


if __name__ == "__main__":
    main()
