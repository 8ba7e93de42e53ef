"""Borůvka minimum spanning forest — the classic BSP graph algorithm
(it is the worked example in Malewicz et al.'s Pregel paper §1; the
reference's BSP API would express it as a vertex program over
``pregel/vertex.lua`` message rounds).

Round shape (all hash-partitioned DataFrame ops, no driver iteration
over rows):

1. per component, pick the minimum outgoing CROSS edge under the
   total order ``(weight, u, w)`` — one ``groupBy(component)
   .min(struct)`` with map-side partial aggregation;
2. the picked edges join the forest; the "partner" map
   ``p(component) = other endpoint's component`` is a functional
   graph whose only cycles are MUTUAL pairs (standard Borůvka
   property: with a TOTAL order on edges, following strictly-minimum
   edges can only close a 2-cycle), so rooting each mutual pair at
   its smaller id and pointer-doubling (Wyllie, the same recurrence
   as ``redirects.resolve_redirects``) collapses every merge tree to
   its root in O(log) self-joins;
3. relabel the surviving cross edges through the root map and drop
   the now-intra-component ones; repeat until no cross edge remains.

The loop-carried state is the LABELED CROSS-EDGE set alone — there is
no vertex→component table at all (the forest output never needs one):
every component label appearing on a cross edge has, by definition, an
outgoing edge and therefore a row in the round's root map, so the
relabel is two equi-joins of the edge set against a map that only
holds LIVE components and shrinks geometrically. Components at least
halve each round, so outer rounds ≤ ceil(log2 V) — ~40 for 10^12
vertices — and the cross-edge set shrinks monotonically as the forest
grows.

Determinism: ties in ``weight`` are broken by the canonical endpoint
pair, so the result is THE minimum spanning forest of the tie-broken
total order (equal to what Kruskal produces under the same order —
the pytest oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import PregelResult, bsp_loop_confs, materialize


def minimum_spanning_forest(
    spark: SparkSession,
    edges: DataFrame,
    num_partitions: int | None = None,
    max_rounds: int = 64,
) -> PregelResult:
    """Minimum spanning forest of the undirected weighted graph.

    Input rows ``(src, dst, weight)``; self-loops are dropped, and of
    parallel edges only the cheapest (under the total order) survives
    canonicalization. ``result.vertices`` holds the forest edges
    ``(u, w, weight)`` with ``u < w`` canonical; ``converged`` is True
    when no cross-component edge remains (always, unless
    ``max_rounds`` is set below ceil(log2 V) — a truncated run returns
    a valid PARTIAL forest, never a wrong edge);
    ``result.aggregates['total_weight']`` is the forest weight and
    ``['n_edges']`` its edge count.
    """
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )

    # Borůvka's loop state shrinks GEOMETRICALLY (components at least
    # halve per round), so a fixed partition count wastes the late
    # rounds on empty-shuffle overhead: at 10^12 vertices the last
    # rounds carry a few thousand live components across tens of
    # thousands of partitions, and at bench scale the fixed per-task
    # cost dominates outright (measured 20.5s -> ~9s at sf0.1). Size
    # each round's exchanges to the rows they actually move — the same
    # rows-proportional re-plan AQE would do, done explicitly because
    # AQE is off inside BSP loops (engine.bsp_loop_confs).
    rows_per_part = 100_000

    def _parts(n_rows: int) -> int:
        return max(1, min(n_part, -(-n_rows // rows_per_part)))

    canon = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("w"),
            F.col("weight").cast("double").alias("weight"),
        )
        .filter((F.col("u") != F.col("w")) & F.col("weight").isNotNull())
        .groupBy("u", "w")
        .agg(F.min("weight").alias("weight"))
    )
    orig_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    with bsp_loop_confs(spark):
        # loop state: cross edges labeled with their endpoints'
        # current components (cu != cw invariant)
        cross = materialize(
            canon.select(
                "u", "w", "weight",
                F.col("u").alias("cu"), F.col("w").alias("cw"),
            ).repartition(n_part, "cu")
        )
        mst_parts: list[DataFrame] = []
        rounds = 0
        converged = False
        try:
            while True:
                # count, not isEmpty: same one cheap job over the
                # checkpointed state, and the row count sizes this round's
                # exchanges (cross shrinks monotonically)
                n_cross = cross.count()
                if n_cross == 0:
                    converged = True
                    break
                if rounds >= max_rounds:
                    break
                rounds += 1
                p_cross = _parts(n_cross)
                # the explicit repartitions below set OUTPUT layouts; the
                # intermediate groupBy/join exchanges follow this conf —
                # shrink both together (restored after the loop)
                spark.conf.set("spark.sql.shuffle.partitions", str(p_cross))
                # min outgoing edge per component under (weight, u, w)
                both = cross.select(
                    F.col("cu").alias("c"), F.col("cw").alias("oc"),
                    "weight", "u", "w",
                ).unionByName(
                    cross.select(
                        F.col("cw").alias("c"), F.col("cu").alias("oc"),
                        "weight", "u", "w",
                    )
                )
                mins = materialize(
                    both.groupBy("c")
                    .agg(F.min(F.struct("weight", "u", "w", "oc")).alias("m"))
                    .select(
                        "c",
                        F.col("m.u").alias("u"),
                        F.col("m.w").alias("w"),
                        F.col("m.weight").alias("weight"),
                        F.col("m.oc").alias("oc"),
                    )
                    .repartition(p_cross, "c")
                )
                # lineage already cut at mins; the forest fragment stays
                # lazy — the one dropDuplicates after the loop removes the
                # both-components-picked-it copies in a single shuffle
                mst_parts.append(mins.select("u", "w", "weight"))
                # partner map: root mutual pairs at their smaller id, then
                # pointer-double the remaining merge trees to their roots
                rev = mins.select(
                    F.col("c").alias("oc"), F.col("oc").alias("oc2")
                )
                ptr = materialize(
                    mins.select("c", "oc")
                    .join(rev, "oc", "left")
                    .select(
                        "c",
                        F.when(
                            (F.col("oc2") == F.col("c"))
                            & (F.col("c") < F.col("oc")),
                            F.col("c"),
                        )
                        .otherwise(F.col("oc"))
                        .alias("ptr"),
                    )
                    .repartition(p_cross, "c")
                )
                n_live = ptr.count()
                p_live = _parts(n_live)
                for _ in range((max(n_live, 1) - 1).bit_length() + 1):
                    b = ptr.select(
                        F.col("c").alias("ptr"), F.col("ptr").alias("nxt")
                    )
                    # quiescence flag fused into the doubling join: the
                    # follow-up emptiness probe reads the cached result
                    nxt = materialize(
                        ptr.join(b, "ptr", "left")
                        .select(
                            "c",
                            F.coalesce("nxt", "ptr").alias("ptr"),
                            (
                                F.col("nxt").isNotNull()
                                & (F.col("nxt") != F.col("ptr"))
                            ).alias("moved"),
                        )
                        .repartition(p_live, "c")
                    )
                    done = nxt.filter("moved").isEmpty()
                    ptr = nxt.drop("moved")
                    if done:
                        break
                # relabel surviving cross edges; every cu/cw is live (it
                # had an outgoing edge) so the left joins always hit
                ru = ptr.select(F.col("c").alias("cu"), F.col("ptr").alias("nu"))
                rw = ptr.select(F.col("c").alias("cw"), F.col("ptr").alias("nw"))
                cross = materialize(
                    cross.join(ru, "cu", "left")
                    .join(rw, "cw", "left")
                    .select(
                        "u", "w", "weight",
                        F.coalesce("nu", "cu").alias("cu"),
                        F.coalesce("nw", "cw").alias("cw"),
                    )
                    .filter(F.col("cu") != F.col("cw"))
                    .repartition(p_cross, "cu")
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig_shuffle)
        if mst_parts:
            forest = mst_parts[0]
            for p in mst_parts[1:]:
                forest = forest.unionByName(p)
            forest = forest.dropDuplicates(["u", "w"])
        else:
            forest = canon.limit(0)
        forest = materialize(forest.repartition(n_part, "u"))
        agg = forest.agg(
            F.coalesce(F.sum("weight"), F.lit(0.0)).alias("tw"),
            F.count(F.lit(1)).alias("ne"),
        ).first()
    return PregelResult(
        vertices=forest,
        supersteps=rounds,
        converged=converged,
        metrics=[],
        aggregates={"total_weight": agg["tw"], "n_edges": agg["ne"]},
    )
