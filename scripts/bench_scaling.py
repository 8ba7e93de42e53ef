"""Scaling-efficiency protocol (BASELINE.md): same PageRank job, same
input, local[8] (N) vs local[32] (4N) in fresh JVMs; efficiency =
(T_32 / T_8) / 4 where T is edges-processed/sec. Writes
BENCH_SCALING.json and prints the markdown table rows for BASELINE.md.

Usage: python scripts/bench_scaling.py [sf_dir] [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, sf_dir: str) -> dict:
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "pagerank_bench_worker.py"),
         str(cpus), sf_dir],
        capture_output=True, text=True, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("BENCHJSON:"):
            return json.loads(line[len("BENCHJSON:"):])
    raise RuntimeError(
        f"worker cpus={cpus} produced no BENCHJSON; stderr tail:\n"
        + p.stderr[-2000:]
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    low = run_level(n_low, sf_dir)
    high = run_level(n_high, sf_dir)
    ratio = (n_high / n_low)
    eff = (high["edges_per_sec"] / low["edges_per_sec"]) / ratio
    result = {
        "sf_dir": sf_dir,
        "low": low,
        "high": high,
        "scaling_efficiency": round(eff, 4),
        "pass_gate_0.8": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    for r in (low, high):
        print(
            f"| pagerank-bench | local[{r['cpus']}] | {r['n_edges']} | "
            f"{r['supersteps']} | {r['wall_sec']} | {r['edges_per_sec']} | "
            f"{r['supersteps_per_hour']} | "
            f"{'—' if r is low else round(eff, 3)} |"
        )
    print(f"scaling_efficiency={eff:.3f} (gate >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})")


if __name__ == "__main__":
    main()
