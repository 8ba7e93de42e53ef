"""A/B the neighborhood-function state representations at scale:
exact array-sets vs HLL sketches on the same synthetic power-law graph,
then HLL alone at 10x (where the exact state physically cannot fit).

The point being measured: exact per-superstep cost tracks SUM(|ball|),
which grows toward V*reachable as the radius grows; sketch cost is flat
at V * sketch_bytes per superstep regardless of ball growth. N(t) from
the sketch run ESTIMATES what the exact state size would have been.

Usage: python scripts/neigh_scale_ab.py [n_small] [n_big] [radius]
Writes BENCH_NEIGH_AB.json and prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(spark, edges, mode, radius, lgk):
    from pregel_spark.graph import neighborhood_function

    res = neighborhood_function(
        spark, edges, max_radius=radius, mode=mode, lgk=lgk,
        exact_limit=10**12, pre_deduped=True,
    )
    res.vertices.write.format("noop").mode("overwrite").save()
    return {
        "mode": mode,
        "radius": radius,
        "lgk": lgk if mode == "hll" else None,
        "supersteps": res.supersteps,
        "step_walls_s": [round(m["wall_ms"] / 1000, 2) for m in res.metrics],
        "n_pairs_per_step": [m["n_pairs"] for m in res.metrics],
        "step_shuffle_write_mb": [
            round(m.get("shuffle_write_bytes", 0) / 1e6, 1) for m in res.metrics
        ],
    }


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    radius = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    lgk = int(os.environ.get("NEIGH_LGK", "8"))

    from pregel_spark.session import get_spark
    from pregel_spark.synth import ensure_synth_edges_parquet

    spark = get_spark(
        "neigh-ab", master="local[32]", shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = {"runs": []}
    for n in (n_small, n_big):
        path = f"/tmp/pregel_bench/synth_edges_{n}"
        ensure_synth_edges_parquet(spark, path, n)
        edges = spark.read.parquet(path)
        modes = ["exact", "hll"] if n == n_small else ["hll"]
        for mode in modes:
            r = run(spark, edges, mode, radius, lgk)
            r["n_edges"] = n
            out["runs"].append(r)
            print("NEIGHAB:" + json.dumps(r))
    with open(os.path.join(REPO, "BENCH_NEIGH_AB.json"), "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
