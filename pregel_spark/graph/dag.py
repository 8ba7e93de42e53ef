"""DAG layering (Kahn rounds) + cycle detection over directed edges.

Pairs with ``scc.condense``: contract the crawl graph's cyclic cores,
then layer the condensation — the layer index is the dependency depth
a topological scheduler (crawl-frontier waves, dataset-build stages)
executes in, and every vertex Kahn's peeling CANNOT reach sits on or
below a cycle, which on a supposedly-acyclic input is the error signal.

The reference runs reachability passes as vertex programs over its BSP
API (``pregel/vertex.lua`` message rounds); here each peel round is
one anti-join + two semi-joins, all hash-partitioned on the same keys.

Scale: rounds = DAG depth; each round touches only the REMAINING edge
set (monotonically shrinking — the deep tail of a web condensation is
tiny). Lineage is cut every round via ``materialize``, the same
localCheckpoint discipline as the other loops (BSP plan-doubling
pitfall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .build import vertices_from_edges
from .engine import PregelResult, bsp_loop_confs, materialize


def topo_levels(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 200,
    num_partitions: int | None = None,
    pre_deduped: bool = False,
) -> PregelResult:
    """Longest-path layering: ``level(v) = 0`` for sources, else
    ``1 + max(level(pred))`` — exactly the round in which Kahn's
    algorithm removes ``v``.

    Returns ``(id, level)`` for every vertex peeled. ``converged`` is
    False when vertices remain after ``max_rounds`` OR when no vertex
    was removable (a cycle: its members and everything downstream of
    them are absent from the output, never mislabeled — same truncation
    honesty as SCC). ``result.aggregates['n_unleveled']`` counts them.
    """
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst")
    if not pre_deduped:
        e = e.distinct()
    with bsp_loop_confs(spark):
        rem_e = materialize(e.repartition(n_part, "dst"))
        rem_v = materialize(vertices_from_edges(rem_e).repartition(n_part, "id"))
        assigned = rem_v.select("id", F.lit(0).cast("int").alias("level")).limit(0)
        n_rem = rem_v.count()
        rounds = 0
        while n_rem > 0 and rounds < max_rounds:
            has_in = rem_e.select(F.col("dst").alias("id"))
            zero = materialize(rem_v.join(has_in, "id", "left_anti"))
            n_zero = zero.count()
            if n_zero == 0:
                break  # every remaining vertex is on/under a cycle
            assigned = assigned.unionByName(
                zero.select("id", F.lit(rounds).cast("int").alias("level"))
            )
            rem_v = materialize(rem_v.join(zero, "id", "left_anti"))
            rem_e = materialize(
                rem_e.join(
                    zero.withColumnRenamed("id", "src"), "src", "left_anti"
                )
            )
            n_rem -= n_zero
            rounds += 1
        converged = n_rem == 0
    return PregelResult(
        vertices=materialize(assigned.repartition(n_part, "id")),
        supersteps=rounds,
        converged=converged,
        metrics=[],
        aggregates={"n_unleveled": n_rem},
    )
