"""Cluster driver for ``spark-submit --py-files`` deployment.

The north rule (BASELINE.json) requires the engine to run "via
spark-submit --py-files on a multi-executor cluster". This is that
entrypoint: a plain driver script that imports ``pregel_spark`` from
the shipped zip and runs any of the four link-graph algorithms over a
pages or edges table, writing results + per-superstep metrics.

Package and submit::

    python scripts/make_pyfiles.py                 # -> dist/pregel_spark.zip
    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/pregel_spark.zip \
        scripts/submit_job.py \
        --algo pagerank --input s3://bucket/pages --input-kind pages \
        --output s3://bucket/out --checkpoint-dir s3://bucket/ck \
        --num-partitions 4096

Notes for real-cluster runs (vs the local[k] test harness):
- size ``--num-partitions`` by data (~128 MB of shuffle per partition),
  not by core count; it feeds both ``spark.sql.shuffle.partitions``
  and the engine's explicit vertex/edge repartitioning.
- ``--checkpoint-dir`` on shared storage makes runs resumable
  (``--resume``) and enables per-partition lineage metrics (I5).
- the session factory is NOT used here: spark-submit owns the session
  config; the engine only requires the confs it sets itself inside
  ``bsp_loop_confs`` (loop-scoped, restored on exit).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--algo", required=True,
                    choices=["pagerank", "cc", "cc_star", "lpa", "triangles"])
    ap.add_argument("--input", required=True,
                    help="pages or edges table path (parquet/iceberg URI)")
    ap.add_argument("--input-kind", default="edges", choices=["pages", "edges"],
                    help="pages: (url, warc_ts, html, text, lang) -> links "
                         "are extracted first; edges: (src, dst[, weight])")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--run-id", default=None,
                    help="stable run id; checkpoints live under "
                         "<checkpoint-dir>/<run-id>, so a restarted driver "
                         "MUST pass the same id for --resume to find them")
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--max-iter", type=int, default=50)
    ap.add_argument("--tol", type=float, default=1e-6)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName(f"pregel-spark-{args.algo}").getOrCreate()
    if args.num_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.num_partitions))

    from pregel_spark.graph import (
        connected_components, edges_from_pages, label_propagation, pagerank,
        triangle_count,
    )
    from pregel_spark.graph.components import connected_components_star

    df = spark.read.parquet(args.input)
    edges = edges_from_pages(df) if args.input_kind == "pages" else df

    if args.resume and not args.run_id:
        ap.error("--resume requires --run-id (checkpoints are scoped per run)")
    common = dict(num_partitions=args.num_partitions,
                  checkpoint_dir=args.checkpoint_dir, resume=args.resume,
                  run_id=args.run_id)
    if args.algo == "pagerank":
        res = pagerank(spark, edges, tol=args.tol, max_iter=args.max_iter, **common)
    elif args.algo == "cc":
        res = connected_components(spark, edges, max_iter=args.max_iter, **common)
    elif args.algo == "cc_star":
        res = connected_components_star(
            spark, edges, max_rounds=args.max_iter,
            num_partitions=args.num_partitions)
    elif args.algo == "lpa":
        res = label_propagation(spark, edges, max_iter=args.max_iter, **common)
    else:  # triangles: one-shot job, no BSP loop
        triangle_count(edges).write.mode("overwrite").parquet(args.output)
        spark.stop()
        return

    res.vertices.write.mode("overwrite").parquet(args.output)
    if res.metrics:
        spark.createDataFrame(res.metrics).write.mode("overwrite").parquet(
            args.output.rstrip("/") + "_metrics")
    print(json.dumps({
        "algo": args.algo, "supersteps": res.supersteps,
        "converged": res.converged, "run_id": res.run_id,
    }))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
