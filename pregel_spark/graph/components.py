"""Connected components by min-label propagation (undirected).

The BSP analog of the reference's only in-tree algorithm (max-value
propagation, ``example/test-worker.lua:25-43``) with ``min`` as the
combiner and label = vertex id. Labels are compared as strings
(lexicographic min) — the same total order the DuckDB/union-find
oracles use, so assignments are exact.

Frontier optimization (the reference's active-vertex filter F2,
``pregel/worker.lua:143-146``): only vertices whose label improved last
superstep scatter — the per-superstep join shrinks as the algorithm
converges. Termination = empty frontier (quiescence,
``pregel/master.lua:77-84``).

Scale note: plain min-label needs O(component diameter) supersteps —
fine for web graphs (small diameter); each superstep is one scatter
join + one min-combine with map-side partial aggregation (hub-safe).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from ..tableio import CheckpointManager
from .build import order_preserving_id_map, undirect, vertices_from_edges
from .engine import PregelResult, ShuffleDelta, bsp_loop_confs, materialize


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 50,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    numeric_ids: bool = True,
    partition_metrics: bool | None = None,
) -> PregelResult:
    """Returns (id, component) — component = lexicographic min vertex id
    reachable treating edges as undirected.

    ``numeric_ids``: run the loop on an ORDER-PRESERVING long mapping of
    the string ids (``order_preserving_id_map``) — min-label semantics
    survive because the mapping is monotone, the per-superstep shuffle
    carries 8-byte keys instead of urls, and the final labels map back
    to the identical strings.
    """
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
    # labels cover ALL vertices of the original edge table (including
    # self-loop-only vertices that undirect() drops as edges)
    if vmap is not None:
        verts0 = vmap.select(F.col("vid").alias("id"))
    else:
        verts0 = vertices_from_edges(edges)
    labels = materialize(
        verts0.select("id", F.col("id").alias("component"))
        .repartition(n_part, "id")
    )
    frontier = labels  # superstep 1: every vertex announces its label

    start_step, metrics = 1, []
    part_metrics: list[dict] = []
    n_metrics_appended = 0
    n_pmetrics_appended = 0
    if resume and ckpt is not None:
        latest = ckpt.latest()
        if latest is not None:
            st, fr, _meta = ckpt.load(spark, latest)
            labels = materialize(st.repartition(n_part, "id"))
            frontier = materialize(fr.repartition(n_part, "id")) if fr is not None else None
            start_step = latest + 1

    shufd = ShuffleDelta(spark)
    with bsp_loop_confs(spark):
        converged = False
        superstep = start_step - 1
        for superstep in range(start_step, max_iter + 1):
            if frontier is None:
                converged = True
                superstep -= 1
                break
            t0 = time.monotonic()
            # scatter J2 + min-combine A1 (combiner = min, pregel/queue.lua:39-52)
            msgs = ue.join(frontier.withColumnRenamed("id", "src"), "src").select(
                F.col("dst").alias("id"), F.col("component").alias("cand")
            )
            mins = msgs.groupBy("id").agg(F.min("cand").alias("cand"))
            joined = labels.join(mins, "id", "left_outer")
            step_plan = joined.select(
                "id",
                F.least(F.col("component"), F.coalesce("cand", F.col("component"))).alias(
                    "component"
                ),
                (
                    F.col("cand").isNotNull() & (F.col("cand") < F.col("component"))
                ).alias("_changed"),
            )
            # changed-count rides the materialization action itself
            # unless per-partition I5 stats are requested
            obs = None
            if not partition_metrics:
                obs = Observation(f"chg_{run_id}_{superstep}")
                step_plan = step_plan.observe(
                    obs, F.sum(F.col("_changed").cast("long")).alias("chg")
                )
            nxt = materialize(step_plan)
            # changed-count grouped by physical partition: same single
            # action, plus the I5 per-partition rows (checkpointed runs)
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
                changed = int(obs.get["chg"] or 0)
            labels = nxt.select("id", "component")
            frontier = nxt.filter(F.col("_changed")).select(
                "id", "component"
            ) if changed else None
            metrics.append(
                {
                    "run_id": run_id,
                    "superstep": superstep,
                    "wall_ms": (time.monotonic() - t0) * 1000,
                    "changed": changed,
                    **shufd.sample(),
                }
            )
            if ckpt is not None and (superstep % checkpoint_interval == 0 or changed == 0):
                ckpt.save(superstep, labels, frontier, meta={"changed": changed})
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
            .withColumnRenamed("component", "_c")
            .join(
                vmap.select(
                    F.col("vid").alias("_c"), F.col("id").alias("component")
                ),
                "_c",
            )
            .select("id", "component")
        )
    return PregelResult(
        vertices=labels,
        supersteps=superstep,
        converged=converged,
        metrics=metrics,
        run_id=run_id,
        partition_metrics=part_metrics,
    )


def _star_round(e: DataFrame, large: bool) -> DataFrame:
    """One large-star / small-star step (Kiveris et al., 'Connected
    Components in MapReduce and Beyond'): view the current edge set
    symmetrically, find each node's minimum over {self} ∪ neighbors,
    and re-point the > (large) or <= (small) neighbors at that minimum.

    Single-pass shape: ONE aggregation computes, per node, BOTH the
    minimum and the (condition-filtered, deduped) neighbor list, and a
    row-local ``explode`` re-points them — no join, no second consumer
    of the symmetrized edges. That makes a star step exactly one O(E)
    exchange (the groupBy itself) plus narrow work, and the only
    materialization per step is the step OUTPUT. Earlier shapes that
    looked shuffle-minimal on paper (repartition once + partition-
    aligned dedup/min/join) measured ~1.9x SLOWER at 100M edges: each
    multi-consumer intermediate (``sym``, ``mins``) had to be
    localCheckpoint-ed to stop Catalyst re-planning it per consumer,
    and caching 2E-row intermediates 4-6x per round costs more wall
    than the exchanges it saved (BENCH_SCALING_cc_star telemetry,
    BASELINE.md). Dedup is row-local for free via ``array_distinct``
    (duplicates across groups are tolerated round-over-round: each
    input row emits at most one output row, so the multiset never
    grows; a single final dedup runs before label extraction).

    Skew note: a node's collected neighbor list is its adjacency —
    the same CSR-blocking bound as ``build.adjacency``. For web-scale
    mega-hubs (degree ~1e8+) route the hot keys through
    ``skew.salted_collect_list`` first; at this tier the min is
    algebraic so hub lists could also be two-phase salted, kept simple
    here."""
    sym = e.select("u", "v").unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    cond = F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
    agg = sym.groupBy("u").agg(
        F.min("v").alias("_mv"),
        F.array_distinct(
            F.collect_list(F.when(cond, F.col("v")))
        ).alias("tgt"),
    ).select("u", F.least("_mv", F.col("u")).alias("m"), "tgt")
    if not large:
        # small star also re-points u itself at m
        agg = agg.select("m", F.concat("tgt", F.array("u")).alias("tgt"))
    out = agg.select(
        F.explode("tgt").alias("u"), F.col("m").alias("v")
    )
    return out.filter(F.col("u") != F.col("v"))


def connected_components_star(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 30,
    num_partitions: int | None = None,
) -> PregelResult:
    """Alternating large-star/small-star connected components —
    O(log n) rounds instead of min-label's O(component diameter), the
    right algorithm for high-diameter graphs at scale. Returns the
    identical (id, component = lexicographic-min member) labels as
    :func:`connected_components` (verified against the union-find
    oracle), via the order-preserving numeric id mapping.
    """
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = vertices_from_edges(edges)
    vmap = materialize(
        order_preserving_id_map(verts, n_part).repartition(n_part, "vid")
    )
    e = (
        undirect(edges)
        .select("src", "dst")
        .join(vmap.withColumnRenamed("id", "src"), "src")
        .select(F.col("vid").alias("u"), "dst")
        .join(vmap.withColumnRenamed("id", "dst"), "dst")
        .select("u", F.col("vid").alias("v"))
        .filter(F.col("u") < F.col("v"))  # canonical undirected pairs
    )
    # dedup folded into the repartition: partitioned-on-u input makes
    # dropDuplicates(u, v) exchange-free (subset rule)
    e = materialize(e.repartition(n_part, "u").dropDuplicates(["u", "v"]))

    metrics: list[dict] = []
    converged = False
    rounds = 0
    prev_sig = None
    shufd = ShuffleDelta(spark)
    with bsp_loop_confs(spark):
        for rounds in range(1, max_rounds + 1):
            t0 = time.monotonic()
            # materialize BETWEEN the stars: the small star references
            # its input twice (union with swap) — unmaterialized, the
            # large-star subtree would compute twice per round
            e = materialize(_star_round(e, large=True))
            e = materialize(_star_round(e, large=False))
            row = e.agg(
                F.count(F.lit(1)).alias("n"),
                # decimal sum: a long sum overflows under ANSI mode
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("sig"),
            ).collect()[0]
            sig = (row["n"], row["sig"])
            m = {
                "superstep": rounds,
                "wall_ms": (time.monotonic() - t0) * 1000,
                "edges": row["n"],
            }
            m.update(shufd.sample())
            metrics.append(m)
            if sig == prev_sig:
                converged = True
                break
            prev_sig = sig

    # the loop's edge multiset may carry duplicates (dedup runs at the
    # head of each star step, not on its output) — dedup once before
    # label extraction
    e = e.dropDuplicates(["u", "v"])
    # fixpoint is a star forest: non-roots point at their component min
    roots = vmap.select(F.col("vid").alias("u")).join(
        e.select("u").distinct(), "u", "left_anti"
    )
    comp_num = e.select("u", F.col("v").alias("c")).unionByName(
        roots.select("u", F.col("u").alias("c"))
    )
    labels = (
        comp_num.withColumnRenamed("u", "_v")
        .join(vmap.withColumnRenamed("vid", "_v"), "_v")
        .withColumnRenamed("c", "_c")
        .join(vmap.select(F.col("vid").alias("_c"), F.col("id").alias("component")), "_c")
        .select("id", "component")
    )
    return PregelResult(
        vertices=labels,
        supersteps=rounds,
        converged=converged,
        metrics=metrics,
        run_id="star",
    )
