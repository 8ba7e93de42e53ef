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

    spark = get_spark(
        f"pagerank-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
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
    res = pagerank(spark, edges, tol=tol, max_iter=max_iter)
    wall = time.monotonic() - t0
    out = {
        "cpus": cpus,
        "sf_dir": sf_dir,
        "n_edges": n_edges,
        "supersteps": res.supersteps,
        "converged": res.converged,
        "wall_sec": round(wall, 3),
        "edges_per_sec": round(n_edges * res.supersteps / wall, 1),
        "supersteps_per_hour": round(res.supersteps / wall * 3600, 1),
        "step_walls_ms": [round(m["wall_ms"], 1) for m in res.metrics],
    }
    print("BENCHJSON:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
