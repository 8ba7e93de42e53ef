"""Worker for the scaling protocol: run PageRank to 1e-6 at a given
parallelism in a FRESH JVM, print one JSON line.

Usage: python scripts/pagerank_bench_worker.py <cpus> <sf_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pregel_spark.session import get_spark


def main():
    cpus = int(sys.argv[1])
    sf_dir = sys.argv[2]
    import __spark_entry__ as entrymod
    from pregel_spark.graph import pagerank

    # partitions sized by data, not cores: a 100M-row shuffle over 8
    # partitions spills; both levels get the same partition count so
    # per-partition work is identical and only parallelism varies
    spark = get_spark(
        f"pagerank-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        # UI on so the loop's ShuffleDelta records per-superstep
        # shuffle-byte deltas (engine.shuffle_totals) — the
        # exchange-volume-invariance evidence in BASELINE.md
        extra_conf={
            # SCALING_UI=0: timed runs go dark (see algo_bench_worker /
            # BASELINE.md round 4 — listener-bus lag charges to steps)
            "spark.ui.enabled": (
                "false" if os.environ.get("SCALING_UI") == "0" else "true"
            ),
            # long waves (SCALING_MAX_ITER up to 200) outrun the default
            # 1000-stage UI retention and would corrupt shuffle deltas
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if sf_dir.endswith(".edges.parquet") or os.path.exists(
        os.path.join(sf_dir, "_SUCCESS")
    ):
        edges = spark.read.parquet(sf_dir)
    else:
        edges = entrymod._edges(spark, sf_dir)
    n_edges = edges.count()
    tol = float(os.environ.get("SCALING_TOL", "1e-6"))
    max_iter = int(os.environ.get("SCALING_MAX_ITER", "200"))
    t0 = time.monotonic()
    # both worker inputs (EDGES_SQL: SELECT DISTINCT; synth_edges:
    # .distinct()) are deduped at the source
    res = pagerank(spark, edges, tol=tol, max_iter=max_iter, pre_deduped=True)
    wall = time.monotonic() - t0
    loop_sec = sum(m["wall_ms"] for m in res.metrics) / 1000.0
    # steady-state estimator: the fastest superstep. Hypervisor steal
    # can only ADD wall time to a fixed-shape superstep, so min-of-steps
    # is the least-contaminated observation (same rationale as
    # scripts/membw_probe.py's max-of-reps).
    min_step_ms = min(m["wall_ms"] for m in res.metrics)
    out = {
        "cpus": cpus,
        "sf_dir": sf_dir,
        "n_edges": n_edges,
        "supersteps": res.supersteps,
        "converged": res.converged,
        "wall_sec": round(wall, 3),
        "setup_sec": round(wall - loop_sec, 3),
        "loop_sec": round(loop_sec, 3),
        "edges_per_sec": round(n_edges * res.supersteps / loop_sec, 1),
        "edges_per_sec_incl_setup": round(n_edges * res.supersteps / wall, 1),
        "supersteps_per_hour": round(res.supersteps / loop_sec * 3600, 1),
        "min_step_ms": round(min_step_ms, 1),
        "edges_per_sec_steady": round(n_edges / (min_step_ms / 1000.0), 1),
        "step_walls_ms": [round(m["wall_ms"], 1) for m in res.metrics],
        "step_shuffle_write_mb": [
            round(m["shuffle_write_bytes"] / 1e6, 1)
            for m in res.metrics
            if "shuffle_write_bytes" in m
        ],
        "step_shuffle_read_mb": [
            round(m["shuffle_read_bytes"] / 1e6, 1)
            for m in res.metrics
            if "shuffle_read_bytes" in m
        ],
    }
    print("BENCHJSON:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
