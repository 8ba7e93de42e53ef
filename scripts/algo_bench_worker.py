"""Worker for the scaling protocol, generalized over algorithms: run
one algorithm at a given parallelism in a FRESH JVM, print one JSON
line. The BASELINE.md protocol (taskset pinning, fixed work, shared
partition count, ample heap) is owned by scripts/bench_scaling.py.

Usage: python scripts/algo_bench_worker.py <algo> <cpus> <sf_dir>
       algo in {pagerank, cc_star, lpa, sssp, sssp_indexed, hits,
       salsa, temporal}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pregel_spark.session import get_spark


def main():
    algo = sys.argv[1]
    cpus = int(sys.argv[2])
    sf_dir = sys.argv[3]
    import __spark_entry__ as entrymod
    from pregel_spark.graph import (
        connected_components_star,
        label_propagation,
        pagerank,
    )

    # partitions sized by data, not cores: a 100M-row shuffle over 8
    # partitions spills; both levels get the same partition count so
    # per-partition work is identical and only parallelism varies.
    # SCALING_PARTITIONS overrides for memory-heavier loops (LPA's
    # per-(vertex,label) count table needs smaller per-task hash maps
    # than PageRank's at the same edge count).
    n_part = int(os.environ.get("SCALING_PARTITIONS", str(max(cpus, 32))))
    spark = get_spark(
        f"{algo}-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=n_part,
        # UI on so loops can record per-superstep shuffle-byte deltas
        # (engine.shuffle_totals) — measurement runs only
        extra_conf={
            # SCALING_UI=0 turns the UI (and shuffle-delta telemetry)
            # off to A/B the listener-bus cost itself — a blocked
            # Observation.get waits on the same bus the UI store feeds
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
    if algo == "pagerank":
        res = pagerank(spark, edges, tol=tol, max_iter=max_iter, pre_deduped=True)
        res.vertices.write.format("noop").mode("overwrite").save()
    elif algo == "cc_star":
        # deterministic fixed work at both levels: runs to its fixpoint
        # (round count is data-determined, identical across levels)
        res = connected_components_star(spark, edges, max_rounds=max_iter)
        res.vertices.write.format("noop").mode("overwrite").save()
    elif algo == "lpa":
        # LPA_MODE=rescatter|frontier|auto for the frontier-vs-full A/B
        res = label_propagation(
            spark, edges, max_iter=max_iter,
            mode=os.environ.get("LPA_MODE", "auto"),
        )
        res.vertices.write.format("noop").mode("overwrite").save()
    elif algo == "sssp":
        # deterministic source: the minimum vertex id; unit weights ->
        # BFS wave over the power-law graph (frontier grows then dies)
        from pyspark.sql import functions as F

        from pregel_spark.graph import shortest_paths

        src0 = edges.agg(F.min("src").alias("m")).collect()[0]["m"]
        res = shortest_paths(spark, edges, sources=[src0], max_iter=max_iter)
        res.vertices.write.format("noop").mode("overwrite").save()
    elif algo == "sssp_indexed":
        # bucket-pruned scan A/B partner of `sssp`: same frontier
        # Bellman-Ford, but each superstep scans ONLY the parquet
        # bucket dirs the frontier hashes into. The index is written
        # once per input and reused across levels (it is the static
        # corpus layout, not per-run work).
        from pyspark.sql import functions as F

        from pregel_spark.graph.sssp import (
            shortest_paths_indexed,
            write_edge_buckets,
        )

        idx_path = os.environ.get(
            "SSSP_IDX_PATH", f"/tmp/pregel_bench/sssp_idx_{n_edges}"
        )
        if not os.path.exists(os.path.join(idx_path, "meta")):
            write_edge_buckets(
                edges, idx_path,
                buckets=int(os.environ.get("SSSP_IDX_BUCKETS", "256")),
            )
        src0 = edges.agg(F.min("src").alias("m")).collect()[0]["m"]
        t0 = time.monotonic()  # exclude the one-time index write
        res = shortest_paths_indexed(
            spark, idx_path, sources=[src0], max_iter=max_iter
        )
        res.vertices.write.format("noop").mode("overwrite").save()
    elif algo == "temporal":
        # time-respecting earliest arrival over the same synthetic
        # graph with deterministic per-arc timestamps (a pure function
        # of the arc, so both levels relax the identical temporal
        # instance) and a broad deterministic source set (ids ending
        # in '0' ~ 10% of vertices -> a multi-wave relaxation, not a
        # single thin BFS chain)
        from pyspark.sql import functions as F

        from pregel_spark.graph import earliest_arrival

        tedges = edges.select(
            "src", "dst",
            (F.pmod(F.xxhash64("src", "dst"), F.lit(1000)))
            .cast("double").alias("t"),
        )
        sources = tedges.filter("src LIKE '%0'").select(
            F.col("src").alias("id")
        ).distinct()
        res = earliest_arrival(
            spark, tedges, sources, t0=0.0, max_iter=max_iter
        )
        res.vertices.write.format("noop").mode("overwrite").save()
    elif algo == "hits":
        from pregel_spark.graph import hits

        res = hits(spark, edges, max_iter=max_iter, pre_deduped=True)
        res.vertices.write.format("noop").mode("overwrite").save()
    elif algo == "salsa":
        from pregel_spark.graph import salsa

        res = salsa(spark, edges, max_iter=max_iter, pre_deduped=True)
        res.vertices.write.format("noop").mode("overwrite").save()
    else:
        raise SystemExit(f"unknown algo {algo}")
    wall = time.monotonic() - t0
    loop_sec = sum(m["wall_ms"] for m in res.metrics) / 1000.0
    out = {
        "algo": algo,
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
        "step_walls_ms": [round(m["wall_ms"], 1) for m in res.metrics],
    }
    if any("buckets_scanned" in m for m in res.metrics):
        out["step_buckets_scanned"] = [
            m.get("buckets_scanned") for m in res.metrics
        ]
    if any("shuffle_write_bytes" in m for m in res.metrics):
        out["step_shuffle_write_mb"] = [
            round(m.get("shuffle_write_bytes", 0) / 1e6, 1) for m in res.metrics
        ]
        out["step_shuffle_read_mb"] = [
            round(m.get("shuffle_read_bytes", 0) / 1e6, 1) for m in res.metrics
        ]
    # steady-state estimator (min-of-steps): steal-resistant, mirrors
    # pagerank_bench_worker — valid when per-superstep work is constant
    # (salsa/hits fixed-k loops) or when per-step exchange volumes are
    # level-invariant so matched-index steps compare like-for-like
    # (lpa rescatter: identical shuffle-byte sequence at every
    # parallelism — the aggregator cross-checks the argmin indexes
    # match before trusting the pair ratio). NOT for shrinking-frontier
    # loops whose cheapest round is a near-empty tail (cc_star, sssp).
    # temporal qualifies too ON THE PROTOCOL INSTANCE: the broad
    # source set keeps arrivals improving every round, so per-step
    # exchange volume is near-constant (measured byte-identical
    # step_shuffle sequences across levels) rather than a shrinking
    # frontier tail; the aggregator's matched-index cross-check guards
    # the pair
    if algo in ("salsa", "hits", "lpa", "temporal") and res.metrics:
        walls = [m["wall_ms"] for m in res.metrics]
        # Matched-volume plateau restriction: when per-step shuffle
        # telemetry exists, candidate steps for the min are those whose
        # shuffle_write is within 1% of the FINAL step's — this is the
        # restriction BENCH_SCALING_temporal.json's steady_note
        # describes. Without it the all-steps min picks the cheap
        # low-volume warmup step (temporal's 339MB step 0 vs its 2.4GB
        # plateau) and understates the level ratio.
        sw = [m.get("shuffle_write_bytes") for m in res.metrics]
        # anchor the plateau to the MAX per-step shuffle_write, not the
        # final step's: decaying-frontier loops (lpa, converging
        # temporal) end on their smallest step, and anchoring there
        # would make the steady estimate reflect the cheapest
        # near-converged step and inflate throughput
        have_sw = all(v is not None for v in sw) and sw and max(sw)
        if have_sw:
            anchor = max(sw)
            plateau = [
                i
                for i, v in enumerate(sw)
                if abs(v - anchor) <= 0.01 * anchor
            ]
        elif algo == "temporal":
            # no byte telemetry (UI off): the plateau restriction
            # cannot be applied, and the all-steps min would pick the
            # low-volume warmup step — emit no steady estimate at all
            plateau = None
        else:
            plateau = list(range(len(walls)))
        if plateau is not None:
            min_idx = min(plateau, key=lambda i: walls[i])
            out["edges_per_sec_steady"] = round(
                n_edges / (walls[min_idx] / 1000.0), 1
            )
            out["steady_step_index"] = min_idx
            out["steady_plateau_steps"] = plateau
    print("BENCHJSON:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
