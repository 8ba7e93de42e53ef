"""Betweenness centrality — k-source Brandes with a depth bound.

Exact betweenness is O(V·E) (Brandes 2001): a forward
shortest-path-counting BFS plus a backward dependency accumulation
per source. At web scale nobody runs all sources; the standard
estimator (Brandes & Pich 2007) samples k sources and scales, and
production systems additionally bound the BFS depth (bounded-distance
betweenness — Borgatti's k-betweenness family): shortest paths longer
than ``max_depth`` hops carry negligible centrality signal on
small-world graphs but dominate the superstep count. Both knobs are
explicit here; with ``sources`` = all vertices and ``max_depth`` >=
diameter the result is exact Brandes (tested so in
``test_betweenness.py``).

Directed semantics (src -> dst paths); per source s and vertex v != s:
    delta_s(v) = sum over w in succ_DAG(v): sigma(v)/sigma(w) * (1 + delta_s(w))
    bc(v)      = sum over sampled s: delta_s(v)
No endpoint credit, no 1/2 factor (directed convention).

BSP shape: the loop state is the (source, vertex) visited table
(s, v, dist, sigma) — k sources run SIMULTANEOUSLY, so the superstep
count is max_depth forward + max_depth backward regardless of k; k
scales the state rows, not the rounds. Each forward superstep is one
frontier ⋈ edges scatter + (s, dst) partial-agg sum + one anti-join
against the visited set; each backward superstep is one level ⋈
reversed-edges ⋈ previous-level join + partial-agg sum. State and
frontier stay hash-partitioned on ``s`` co-located across rounds.
Sigma counts stay exact in int64 (path counts within <= max_depth
hops; overflow would need >9e18 equal-length paths — unreachable at
the depths this bounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import bsp_loop_confs, materialize


def betweenness(
    spark: SparkSession,
    edges: DataFrame,
    sources: list[str],
    max_depth: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, betweenness) over paths from ``sources`` of length <=
    ``max_depth``; vertices with zero accumulated dependency are
    omitted (join back against your vertex table for dense output)."""
    if not sources:
        raise ValueError("betweenness needs at least one source")
    # duplicate sources would double-count their whole dependency
    # chain through the (s, v) state — dedupe, order-preserving
    sources = list(dict.fromkeys(sources))
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    with bsp_loop_confs(spark):
        e = materialize(e.repartition(n_part, "src"))
        src_df = spark.createDataFrame([(s,) for s in sources], ["s"])
        state = materialize(
            src_df.select(
                "s",
                F.col("s").alias("v"),
                F.lit(0).alias("dist"),
                F.lit(1).cast("long").alias("sigma"),
            ).repartition(n_part, "s")
        )
        frontier = state
        max_d = 0
        for d in range(max_depth):
            msgs = (
                frontier.join(e, frontier["v"] == e["src"])
                .groupBy("s", F.col("dst").alias("v"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            fresh = msgs.join(state.select("s", "v"), ["s", "v"], "left_anti")
            frontier = materialize(
                fresh.select("s", "v", F.lit(d + 1).alias("dist"), "sigma")
                .repartition(n_part, "s")
            )
            if frontier.limit(1).count() == 0:
                break
            max_d = d + 1
            state = materialize(
                state.unionByName(frontier).repartition(n_part, "s")
            )
        # backward accumulation, deepest level first; delta starts 0.
        # `delta` carries ONLY the level produced last round (the DAG is
        # leveled, so level-d processing reads deltas of dist-d vertices
        # alone); every produced level is also kept in `level_deltas`
        # for the final bc sum — replacing the pool without keeping the
        # history would sum just the shallowest level
        delta = None
        level_deltas = []
        for d in range(max_d, 0, -1):
            w_lvl = state.filter(F.col("dist") == d).select(
                "s", F.col("v").alias("w"), F.col("sigma").alias("sigma_w")
            )
            if delta is not None:
                w_lvl = w_lvl.join(
                    delta.withColumnRenamed("v", "w"), ["s", "w"], "left"
                ).select(
                    "s", "w", "sigma_w",
                    F.coalesce("delta", F.lit(0.0)).alias("delta_w"),
                )
            else:
                w_lvl = w_lvl.withColumn("delta_w", F.lit(0.0))
            contrib = (
                w_lvl.join(e, w_lvl["w"] == e["dst"])
                .select("s", F.col("src").alias("v"), "sigma_w", "delta_w")
                .join(
                    state.filter(F.col("dist") == d - 1).select(
                        "s", "v", F.col("sigma").alias("sigma_v")
                    ),
                    ["s", "v"],
                )
                .groupBy("s", "v")
                .agg(
                    F.sum(
                        F.col("sigma_v").cast("double")
                        / F.col("sigma_w").cast("double")
                        * (F.lit(1.0) + F.col("delta_w"))
                    ).alias("delta")
                )
            )
            delta = materialize(contrib.repartition(n_part, "s"))
            level_deltas.append(delta)
        if not level_deltas:
            return src_df.select(
                F.col("s").alias("id"), F.lit(0.0).alias("betweenness")
            ).limit(0)
        all_d = level_deltas[0]
        for extra in level_deltas[1:]:
            all_d = all_d.unionByName(extra)
        return (
            all_d.join(
                src_df.select(F.col("s"), F.col("s").alias("v")),
                ["s", "v"],
                "left_anti",
            )
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum("delta").alias("betweenness"))
        )
