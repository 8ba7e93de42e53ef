"""Maximal independent set — deterministic Luby on the undirected
simple graph.

Luby's algorithm (1986) is THE textbook BSP symmetry-breaking
primitive: each round every live vertex draws a priority, local minima
against all live neighbors join the MIS, and winners' neighborhoods
leave the graph; O(log n) rounds with high probability. Downstream it
is how distributed graph coloring, matching, and scheduling
bootstrap — and on web graphs it picks non-adjacent representative
pages (e.g. one crawl seed per tightly-linked cluster).

Deterministic twist for this engine: the per-round priority is the
engine-portable seeded hash ``hash60("<seed>:<round>:" || id)``
(``pipeline/hashing``), NOT a random draw — so the chosen MIS is a
pure function of (graph, seed), reproducible across runs,
partitionings, and engines (the DuckDB oracle re-derives the same
priorities), while remaining adversarial-input-resistant in the way
Luby needs (hash values are uniform per round; ties broken by id —
strict total order). The result is verified MAXIMAL and INDEPENDENT
by construction and by tests.

Scale: loop state is the live vertex set (only shrinks) partitioned
on id; each round is one neighbor-min exchange over the live edge
set + two semi/anti-joins to remove winners and their neighbors. The
live edge set is re-filtered (not rebuilt) each round. Superstep
count O(log n) w.h.p.; ``max_rounds`` is a safety cap that raises if
exhausted (a correct Luby run on any graph terminates well before)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline.hashing import seeded_hash60
from .build import undirect
from .engine import bsp_loop_confs, materialize


def maximal_independent_set(
    spark: SparkSession,
    edges: DataFrame,
    seed: int = 0,
    max_rounds: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, round) — the deterministic Luby MIS; ``round`` is the
    1-based round in which the vertex won (an audit/debug column:
    early winners are low-degree-neighborhood vertices)."""
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    with bsp_loop_confs(spark):
        ue = (
            undirect(edges)
            .filter(F.col("src") != F.col("dst"))
            .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        )
        live_e = materialize(ue.repartition(n_part, "u"))
        live_v = materialize(
            live_e.select(F.col("u").alias("id"))
            .distinct()
            .repartition(n_part, "id")
        )
        # isolated vertices (no edges after self-loop drop) are always
        # in the MIS — they never conflict; collect them up front
        iso = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
            .join(live_v, "id", "left_anti")
            .withColumn("round", F.lit(0))
        )
        winners = [materialize(iso.repartition(n_part, "id"))]
        for rnd in range(1, max_rounds + 1):
            if live_v.limit(1).count() == 0:
                break
            pri = F.struct(
                seeded_hash60(seed, F.concat(F.lit(f"{rnd}:"), F.col("id"))).alias(
                    "h"
                ),
                F.col("id").alias("tb"),
            )
            pv = live_v.select("id", pri.alias("p"))
            # min neighbor priority per live vertex (one exchange)
            nbr_min = (
                live_e.join(pv.select(F.col("id").alias("v"), F.col("p").alias("pv")), "v")
                .groupBy("u")
                .agg(F.min("pv").alias("nmin"))
            )
            win = (
                pv.join(nbr_min.withColumnRenamed("u", "id"), "id", "left")
                .filter(F.col("nmin").isNull() | (F.col("p") < F.col("nmin")))
                .select("id")
            )
            win = materialize(
                win.withColumn("round", F.lit(rnd)).repartition(n_part, "id")
            )
            winners.append(win)
            # remove winners and their whole neighborhoods from play
            dead = win.select("id").unionByName(
                live_e.join(
                    win.select(F.col("id").alias("u")), "u", "left_semi"
                ).select(F.col("v").alias("id"))
            ).distinct()
            live_v = materialize(
                live_v.join(dead, "id", "left_anti").repartition(n_part, "id")
            )
            live_e = materialize(
                live_e.join(live_v.select(F.col("id").alias("u")), "u", "left_semi")
                .join(live_v.select(F.col("id").alias("v")), "v", "left_semi")
                .repartition(n_part, "u")
            )
        if live_v.limit(1).count() > 0:
            raise RuntimeError(
                f"Luby MIS did not terminate within {max_rounds} rounds — "
                "O(log n) expected; raise max_rounds only if n justifies it"
            )
        out = winners[0]
        for w in winners[1:]:
            out = out.unionByName(w)
        return out
