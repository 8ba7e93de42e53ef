"""Saturation-curve companion to the N->4N scaling protocol.

Runs the SAME PageRank job (fresh taskset-pinned JVM per level, same
cached 100M-edge input, fixed superstep count) at a ladder of core
counts and reports loop-phase edges/sec per level plus every 4x-pair
efficiency.  Motivation: on a single host all cores share one memory
bus, so any shuffle-volume-bound loop hits an aggregate-bandwidth
ceiling; a real N->4N *cluster* adds a bus/NIC/disk per executor.  The
curve (together with scripts/membw_probe.py) localises where the
shared-resource ceiling starts, so the pair that stays below it is the
faithful proxy for per-executor-constant-resource scaling, while the
saturated pair measures the host, not the engine.

Usage: python scripts/bench_scaling_curve.py [sf_dir] [levels...]
  default levels: 2 4 8 16 32; writes BENCH_SCALING_CURVE.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_scaling import run_level  # noqa: E402


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/tmp/pregel_bench/synth_edges_100000000"
    levels = [int(a) for a in args[1:]] or [2, 4, 8, 16, 32]
    os.environ.setdefault("SCALING_TOL", "0")
    os.environ.setdefault("SCALING_MAX_ITER", "10")
    runs = {}
    for c in levels:
        print(f"--- running level local[{c}] ...", flush=True)
        r = run_level(c, sf_dir)
        runs[str(c)] = r
        print(
            f"local[{c}]: loop {r['loop_sec']}s  "
            f"{r['edges_per_sec']:,.0f} edges/s  "
            f"({r['edges_per_sec'] / c:,.0f}/core)",
            flush=True,
        )
        # persist incrementally so a killed session keeps partial data
        _write(sf_dir, levels, runs)
    _write(sf_dir, levels, runs, final=True)


def _write(sf_dir, levels, runs, final=False):
    pairs = {}
    for lo in levels:
        hi = lo * 4
        if str(lo) in runs and str(hi) in runs:
            eff = (
                runs[str(hi)]["edges_per_sec"]
                / runs[str(lo)]["edges_per_sec"]
            ) / 4.0
            pairs[f"{lo}->{hi}"] = round(eff, 4)
    out = {
        "algo": "pagerank",
        "sf_dir": sf_dir,
        "protocol": "fresh taskset-pinned JVM per level, 48g heap, "
        "SCALING_MAX_ITER fixed supersteps, loop-phase edges/sec",
        "levels": {
            k: {
                kk: v[kk]
                for kk in (
                    "cpus",
                    "n_edges",
                    "supersteps",
                    "loop_sec",
                    "setup_sec",
                    "edges_per_sec",
                    "supersteps_per_hour",
                    "step_walls_ms",
                )
            }
            for k, v in runs.items()
        },
        "per_core_edges_per_sec": {
            k: round(v["edges_per_sec"] / v["cpus"], 1) for k, v in runs.items()
        },
        "pair_efficiency_4x": pairs,
        "complete": final,
    }
    with open(os.path.join(REPO, "BENCH_SCALING_CURVE.json"), "w") as f:
        json.dump(out, f, indent=2)
    if final:
        print(json.dumps({"pair_efficiency_4x": pairs}, indent=2))


if __name__ == "__main__":
    main()
