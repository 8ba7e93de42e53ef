"""Scaling-efficiency protocol (BASELINE.md): same PageRank job, same
input, local[8] (N) vs local[32] (4N) in fresh JVMs; efficiency =
(T_32 / T_8) / 4 where T is edges-processed/sec. Writes
BENCH_SCALING.json and prints the markdown table rows for BASELINE.md.

Usage: python scripts/bench_scaling.py [--algo=pagerank|cc_star|lpa]
           [--edges=N | sf_dir] [n_low] [n_high]

Non-pagerank algorithms run fixed deterministic work at both levels
(cc_star to its data-determined fixpoint, lpa a fixed iteration count)
and write BENCH_SCALING_<algo>.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(
    cpus: int, sf_dir: str, algo: str = "pagerank", ui: bool = False
) -> dict:
    """Fresh JVM pinned to exactly `cpus` host CPUs via taskset —
    without pinning, a local[8] JVM still spreads GC/shuffle-IO/codegen
    threads over all 32 host cores, inflating the low-core baseline and
    corrupting the efficiency ratio.

    ``ui=False`` for TIMED runs (round-4 finding): the UI listener bus
    that feeds the per-superstep shuffle-byte telemetry lags behind a
    busy job stream, and a blocked Observation/metrics read charges
    that lag to the superstep wall — measured +63 s on an 8-core
    100M-edge SSSP loop (111.9 s -> 48.8 s with the UI off) versus a
    much smaller penalty at 2 cores, i.e. the telemetry itself biased
    the efficiency ratio DOWN. Timed runs go dark; one extra untimed
    high-level run with ``ui=True`` collects the byte telemetry."""
    if algo == "pagerank":
        cmd = [sys.executable,
               os.path.join(REPO, "scripts", "pagerank_bench_worker.py"),
               str(cpus), sf_dir]
    else:
        cmd = [sys.executable,
               os.path.join(REPO, "scripts", "algo_bench_worker.py"),
               algo, str(cpus), sf_dir]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{cpus - 1}"] + cmd
    env = dict(os.environ)
    env["SCALING_UI"] = "1" if ui else "0"
    env.setdefault("SCALING_TOL", "0")
    env.setdefault("SCALING_MAX_ITER", "10")
    # ample heap: GC pressure at the default 16g produced 10-20s
    # full-GC superstep outliers that corrupt the ratio
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    best = None
    reps = 1 if ui else int(os.environ.get("SCALING_REPS", "1"))
    for _ in range(reps):
        p = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600, env=env
        )
        got = None
        for line in p.stdout.splitlines():
            if line.startswith("BENCHJSON:"):
                got = json.loads(line[len("BENCHJSON:"):])
        if got is None:
            raise RuntimeError(
                f"worker cpus={cpus} produced no BENCHJSON; stderr tail:\n"
                + p.stderr[-2000:]
            )
        # min loop wall across reps: hypervisor steal and host noise
        # can only ADD time, so the fastest rep is the closest to the
        # machine's capability (same rationale as membw_probe's
        # max-of-reps). Reps are whole fresh-JVM runs, never mixed
        # per-step.
        if best is None or got["loop_sec"] < best["loop_sec"]:
            best = got
    best["reps"] = reps
    return best


def synth_input(n_edges: int) -> str:
    """Generate (once) a large synthetic edge table so supersteps are
    compute-bound — the scaling protocol needs per-core work >> fixed
    per-superstep overhead (see pregel_spark/synth.py)."""
    sys.path.insert(0, REPO)
    from pregel_spark.session import get_spark
    from pregel_spark.synth import ensure_synth_edges_parquet

    path = f"/tmp/pregel_bench/synth_edges_{n_edges}"
    spark = get_spark("synth-edges", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_synth_edges_parquet(spark, path, n_edges)
    spark.stop()
    return path


def main():
    args = sys.argv[1:]
    algo = "pagerank"
    if args and args[0].startswith("--algo="):
        algo = args[0].split("=")[1]
        args = args[1:]
    if args and args[0].startswith("--edges="):
        sf_dir = synth_input(int(args[0].split("=")[1]))
        args = args[1:]
    elif args:
        sf_dir = args[0]
        args = args[1:]
    else:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_low = int(args[0]) if len(args) > 0 else 8
    n_high = int(args[1]) if len(args) > 1 else 32
    low = run_level(n_low, sf_dir, algo, ui=False)
    high = run_level(n_high, sf_dir, algo, ui=False)
    # one extra UNTIMED high-level run with the UI on: captures the
    # per-superstep shuffle-byte telemetry (work-invariance evidence)
    # without contaminating the timed pair. Skip with SCALING_TELEMETRY=0.
    telem = None
    if os.environ.get("SCALING_TELEMETRY", "1") != "0":
        telem = run_level(n_high, sf_dir, algo, ui=True)
    ratio = (n_high / n_low)
    # efficiency on SUPERSTEP throughput (the north metric is
    # supersteps/hour and edges/sec of the iteration); one-time ingest
    # (read + degree/link build + id mapping) is reported separately —
    # it is amortized over arbitrarily many supersteps in production
    eff = (high["edges_per_sec"] / low["edges_per_sec"]) / ratio
    eff_total = (
        high["edges_per_sec_incl_setup"] / low["edges_per_sec_incl_setup"]
    ) / ratio
    result = {
        "algo": algo,
        "sf_dir": sf_dir,
        "low": low,
        "high": high,
        "scaling_efficiency": round(eff, 4),
        "scaling_efficiency_incl_setup": round(eff_total, 4),
        "pass_gate_0.8": eff >= 0.8,
        "protocol_note": (
            "timed runs executed with spark.ui disabled (the telemetry "
            "listener bus adds parallelism-dependent lag to superstep "
            "walls; see BASELINE.md round 4); telemetry block is a "
            "separate UNTIMED high-level run with the UI on"
        ),
    }
    if telem is not None:
        result["telemetry"] = {
            k: telem[k]
            for k in (
                "cpus", "supersteps", "step_shuffle_write_mb",
                "step_shuffle_read_mb", "step_buckets_scanned",
                "step_walls_ms",
            )
            if k in telem
        }
    if "edges_per_sec_steady" in low and "edges_per_sec_steady" in high:
        # min-of-steps estimator: steal-resistant (see worker docstring).
        # When the workers report which step won (variable-volume loops
        # like lpa), require the same step index at both levels so the
        # ratio compares identically-shaped exchanges.
        idx_ok = low.get("steady_step_index") == high.get("steady_step_index")
        if idx_ok or "steady_step_index" not in low:
            result["scaling_efficiency_steady"] = round(
                (high["edges_per_sec_steady"] / low["edges_per_sec_steady"])
                / ratio,
                4,
            )
    out_name = (
        "BENCH_SCALING.json" if algo == "pagerank"
        else f"BENCH_SCALING_{algo}.json"
    )
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(result, f, indent=2)
    for r in (low, high):
        print(
            f"| {algo}-bench | local[{r['cpus']}] | {r['n_edges']} | "
            f"{r['supersteps']} | {r['wall_sec']} | {r['edges_per_sec']} | "
            f"{r['supersteps_per_hour']} | "
            f"{'—' if r is low else round(eff, 3)} |"
        )
    print(f"scaling_efficiency={eff:.3f} (gate >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})")


if __name__ == "__main__":
    main()
