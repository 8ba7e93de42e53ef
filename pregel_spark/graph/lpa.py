"""Synchronous label propagation clustering (deterministic).

Every superstep every vertex adopts the most frequent label among its
neighbors (undirected), ties broken by the lexicographically smallest
label (FIXTURES.md §6 — determinism is required for the exact oracle
match; the classic randomized-async LPA is not reproducible). Vertices
with no neighbors keep their label. Stops when no label changes or at
``max_iter`` (sync LPA may oscillate on bipartite structures — the cap
is part of the pinned semantics, oracle uses the same cap).

Plan per superstep: scatter join + ``groupBy(id,label).count`` +
windowed argmax (``row_number`` over count desc, label asc). The
count aggregation gets map-side partial aggregation; the window is
partitioned by vertex so no global sort.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..tableio import CheckpointManager
from .build import order_preserving_id_map, undirect, vertices_from_edges
from .engine import PregelResult, bsp_loop_confs, materialize


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 10,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    numeric_ids: bool = True,
    argmax: str = "struct",
    partition_metrics: bool | None = None,
) -> PregelResult:
    """Returns (id, label) after synchronous LPA.

    ``numeric_ids``: loop on the order-preserving long mapping (see
    ``connected_components``) — the mode count is relabel-invariant and
    the min tie-break survives a monotone mapping, so assignments are
    byte-identical after mapping back."""
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    run_id = run_id or uuid.uuid4().hex[:12]
    ckpt = CheckpointManager(checkpoint_dir, run_id) if checkpoint_dir else None
    if partition_metrics is None:
        partition_metrics = ckpt is not None  # see pagerank.py rationale

    ue = undirect(edges).select("src", "dst")
    vmap = None
    if numeric_ids:
        vmap = materialize(
            order_preserving_id_map(vertices_from_edges(edges), n_part)
            .repartition(n_part, "vid")
        )
        ue = (
            ue.join(vmap.withColumnRenamed("id", "src"), "src")
            .select(F.col("vid").alias("src"), "dst")
            .join(vmap.withColumnRenamed("id", "dst"), "dst")
            .select("src", F.col("vid").alias("dst"))
        )
    ue = materialize(ue.repartition(n_part, "src"))
    if vmap is not None:
        verts0 = vmap.select(F.col("vid").alias("id"))
    else:
        verts0 = vertices_from_edges(edges)
    labels = materialize(
        verts0.select("id", F.col("id").alias("label"))
        .repartition(n_part, "id")
    )

    start_step, metrics = 1, []
    part_metrics: list[dict] = []
    n_metrics_appended = 0
    n_pmetrics_appended = 0
    if resume and ckpt is not None:
        latest = ckpt.latest()
        if latest is not None:
            st, _, _ = ckpt.load(spark, latest)
            labels = materialize(st.repartition(n_part, "id"))
            start_step = latest + 1

    with bsp_loop_confs(spark):
        converged = False
        superstep = start_step - 1
        w = Window.partitionBy("id").orderBy(F.desc("n"), F.asc("cand"))
        for superstep in range(start_step, max_iter + 1):
            t0 = time.monotonic()
            msgs = ue.join(labels.withColumnRenamed("id", "src"), "src").select(
                F.col("dst").alias("id"), F.col("label").alias("cand")
            )
            counts = msgs.groupBy("id", "cand").agg(F.count(F.lit(1)).alias("n"))
            if vmap is not None and argmax == "struct":
                # numeric labels: the deterministic argmax (n desc, cand
                # asc) is max(struct(n, -cand)) — one aggregation instead
                # of a row_number window (A/B-able; see BASELINE.md)
                best = (
                    counts.groupBy("id")
                    .agg(
                        F.max(
                            F.struct(F.col("n"), (-F.col("cand")).alias("nc"))
                        ).alias("m")
                    )
                    .select("id", (-F.col("m.nc")).alias("new_label"))
                )
            else:
                best = (
                    counts.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .select("id", F.col("cand").alias("new_label"))
                )
            nxt = materialize(
                labels.join(best, "id", "left_outer")
                .select(
                    "id",
                    F.coalesce("new_label", F.col("label")).alias("label"),
                    (
                        F.col("new_label").isNotNull()
                        & (F.col("new_label") != F.col("label"))
                    ).alias("_changed"),
                )
                )
            if partition_metrics:
                prows = nxt.groupBy(F.spark_partition_id().alias("pid")).agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.sum(F.when(F.col("_changed"), 1).otherwise(0)).alias("changed"),
                ).collect()
                changed = sum(r["changed"] or 0 for r in prows)
                part_metrics.extend(
                    {
                        "run_id": run_id,
                        "superstep": superstep,
                        "partition_id": r["pid"],
                        "rows": r["rows"],
                    }
                    for r in prows
                )
            else:
                changed = nxt.filter(F.col("_changed")).count()
            labels = nxt.select("id", "label")
            metrics.append(
                {
                    "run_id": run_id,
                    "superstep": superstep,
                    "wall_ms": (time.monotonic() - t0) * 1000,
                    "changed": changed,
                }
            )
            if ckpt is not None and (superstep % checkpoint_interval == 0 or changed == 0):
                ckpt.save(superstep, labels, meta={"changed": changed})
                ckpt.append_metrics(spark, metrics[n_metrics_appended:])
                n_metrics_appended = len(metrics)
                ckpt.append_partition_metrics(spark, part_metrics[n_pmetrics_appended:])
                n_pmetrics_appended = len(part_metrics)
            if changed == 0:
                converged = True
                break

    if vmap is not None:
        labels = (
            labels.withColumnRenamed("id", "_v")
            .join(vmap.withColumnRenamed("vid", "_v"), "_v")
            .withColumnRenamed("label", "_l")
            .join(
                vmap.select(F.col("vid").alias("_l"), F.col("id").alias("label")),
                "_l",
            )
            .select("id", "label")
        )
    return PregelResult(
        vertices=labels,
        supersteps=superstep,
        converged=converged,
        metrics=metrics,
        run_id=run_id,
        partition_metrics=part_metrics,
    )
