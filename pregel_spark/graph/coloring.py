"""Greedy graph coloring — deterministic Jones-Plassmann.

Jones & Plassmann (1993): every vertex draws a fixed priority; each
round the uncolored vertices that beat ALL their uncolored neighbors
color themselves with the smallest color absent from their
already-colored neighborhood (the minimal excludant). Adjacent
vertices can never win the same round (the local max is strict and
unique), so every round's simultaneous assignment is proper; expected
rounds are O(log n) for random priorities. Uses ≤ Δ+1 colors.

On web graphs coloring is the scheduling primitive: color classes are
conflict-free batches (per-host crawl slots, parallel mutation groups
over the vertex store — the reference applies mutations through a
single-fiber barrier, `pregel/master.lua`; a coloring makes the same
safety explicit at cluster scale).

Determinism: the priority is the engine-portable
``hash60("<seed>:" || id)`` with id tie-break (strict total order) —
the coloring is a pure function of (graph, seed), reproducible across
runs, partitionings, and engines; the DuckDB oracle re-derives it.
The mex is an ascending fold over the sorted distinct neighbor
colors: acc starts 0 and increments exactly on x == acc.

Scale: loop state = the uncolored set (only shrinks) + the color
table (only grows), both hash-partitioned on id; per round ONE
neighbor-max exchange over the uncolored-restricted edge set + one
winner-neighborhood color gather (collect_set bounded by ≤ Δ+1
distinct colors) + set maintenance semi/anti-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline.hashing import seeded_hash60
from .build import undirect
from .engine import bsp_loop_confs, materialize


def _mex(colors_arr) -> F.Column:
    return F.aggregate(
        F.array_sort(colors_arr),
        F.lit(0),
        lambda acc, x: F.when(x == acc, acc + 1).otherwise(acc),
    )


def greedy_coloring(
    spark: SparkSession,
    edges: DataFrame,
    seed: int = 0,
    rounds: int | None = None,
    max_rounds: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, color, round) — the deterministic Jones-Plassmann coloring.

    ``rounds=None`` iterates to completion (raises past ``max_rounds``
    — O(log n) expected, so exhaustion means something is wrong);
    ``rounds=R`` runs exactly R rounds and returns the partial
    coloring (the fixed-round contract mode, exactly unrollable by an
    external oracle). Isolated vertices take color 0 in round 0.
    """
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    with bsp_loop_confs(spark):
        ue = (
            undirect(edges)
            .filter(F.col("src") != F.col("dst"))
            .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        )
        ue = materialize(ue.repartition(n_part, "u"))
        live = materialize(
            ue.select(F.col("u").alias("id")).distinct().repartition(n_part, "id")
        )
        iso = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
            .join(live, "id", "left_anti")
            .select("id", F.lit(0).alias("color"), F.lit(0).alias("round"))
        )
        colored = [materialize(iso.repartition(n_part, "id"))]
        colors = colored[0].select("id", "color")
        n_rounds = rounds if rounds is not None else max_rounds
        for rnd in range(1, n_rounds + 1):
            if live.limit(1).count() == 0:
                break
            pri = F.struct(
                seeded_hash60(seed, F.col("id")).alias("h"), F.col("id").alias("tb")
            )
            pv = live.select("id", pri.alias("p"))
            # ue.u is already uncolored-only (pruned at round end); the
            # inner join on v keeps only uncolored neighbors' priorities
            nbr_max = (
                ue.join(pv.select(F.col("id").alias("v"), F.col("p").alias("pn")), "v")
                .groupBy("u")
                .agg(F.max("pn").alias("nmax"))
            )
            win = (
                pv.join(nbr_max.withColumnRenamed("u", "id"), "id", "left")
                .filter(F.col("nmax").isNull() | (F.col("p") > F.col("nmax")))
                .select("id")
            )
            used = (
                ue.join(win.select(F.col("id").alias("u")), "u", "left_semi")
                .join(
                    colors.select(F.col("id").alias("v"), F.col("color").alias("nc")),
                    "v",
                )
                .groupBy("u")
                .agg(F.collect_set("nc").alias("ncs"))
            )
            new = materialize(
                win.join(used.withColumnRenamed("u", "id"), "id", "left")
                .select(
                    "id",
                    _mex(
                        F.coalesce("ncs", F.array().cast("array<int>"))
                    ).alias("color"),
                    F.lit(rnd).alias("round"),
                )
                .repartition(n_part, "id")
            )
            colored.append(new)
            colors = materialize(
                colors.unionByName(new.select("id", "color")).repartition(
                    n_part, "id"
                )
            )
            live = materialize(
                live.join(new, "id", "left_anti").repartition(n_part, "id")
            )
            ue = materialize(
                ue.join(live.select(F.col("id").alias("u")), "u", "left_semi")
                .repartition(n_part, "u")
            )
        if rounds is None and live.limit(1).count() > 0:
            raise RuntimeError(
                f"Jones-Plassmann did not finish within {max_rounds} rounds — "
                "O(log n) expected; raise max_rounds only if n justifies it"
            )
        out = colored[0]
        for c in colored[1:]:
            out = out.unionByName(c)
        return out
