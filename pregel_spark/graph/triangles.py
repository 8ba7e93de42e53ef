"""Triangle counting — pure DataFrame, no iteration.

Degree-ordered orientation (the standard shuffle-minimizing scheme):
symmetrize + dedup the edge set, then keep each undirected edge once,
directed from the endpoint with smaller ``(degree, id)`` to the larger.
Wedges are a self-join of the oriented edges on their common smallest
vertex; a wedge closes into a triangle iff its (v, w) pair is itself an
oriented edge (semi-join). Orientation bounds the join fan-out by the
graph's arboricity — the hub explosion of naive 3-way self-joins on
skewed graphs never materializes, because a hub's edges point INTO it
from low-degree vertices.

Counts: global (one row) and per-vertex (each triangle credits all
three corners). Exact, matches the combination-counting oracle
(FIXTURES.md §6 — K5 ∪ K4 + bridge = 14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .build import undirect


def _oriented(edges: DataFrame) -> DataFrame:
    """Each undirected edge exactly once, low (deg, id) -> high.

    Checkpointed (and the symmetrized set feeding it): the oriented
    table is referenced THREE times by the wedge join and its closer,
    and the symmetrized set twice more inside this function — left
    lazy, every reference re-expands the whole upstream subtree
    multiplicatively (measured: 108 scans of the same edge parquet in
    one triangle_count plan, 348 in clustering_coeff, zero
    ReusedExchange). Both tables are O(|E|) two-column rows — the same
    thing a 100 TB run would persist before a 3-way self-join."""
    from .engine import materialize

    ue = materialize(undirect(edges).select("src", "dst"))
    deg = ue.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    e = (
        ue.join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "ds"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "dd"), "dst")
        .filter(
            (F.col("ds") < F.col("dd"))
            | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
    )
    return materialize(e)


def _triangles(edges: DataFrame) -> DataFrame:
    """All triangles as (u, v, w) rows, each exactly once."""
    ce = _oriented(edges)
    e1 = ce.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = ce.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wedges = e1.join(e2, "u").filter(F.col("v") < F.col("w"))
    # close the wedge: (v, w) must be an oriented edge in either order
    closer = ce.select(
        F.least("src", "dst").alias("v"), F.greatest("src", "dst").alias("w")
    )
    return wedges.join(closer, ["v", "w"], "left_semi").select("u", "v", "w")


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count as a 1-row DataFrame (n_triangles)."""
    return _triangles(edges).agg(F.count(F.lit(1)).alias("n_triangles"))


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, triangles) — vertices in no triangle included with 0."""
    from .engine import materialize

    # the triangle set is credited from all three corners (3 refs)
    tris = materialize(_triangles(edges))
    credits = (
        tris.select(F.col("u").alias("id"))
        .unionByName(tris.select(F.col("v").alias("id")))
        .unionByName(tris.select(F.col("w").alias("id")))
    )
    counts = credits.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return verts.join(counts, "id", "left_outer").select(
        "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


def k_truss(
    spark,
    edges: DataFrame,
    k: int = 4,
    max_rounds: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """k-truss decomposition (Cohen 2008, the MapReduce formulation):
    the maximal subgraph in which every edge closes >= k-2 triangles —
    the standard cohesive-community core on web/social graphs, strictly
    stronger than the degree-based k-core (``kcore``).

    Peels by rounds: compute per-edge triangle support over the
    CURRENT surviving edge set, drop edges with support < k-2, repeat
    until no edge drops (fixpoint) or ``max_rounds``. Returns the
    surviving canonical edges (u < v) with the support computed in the
    final executed round — for a fixpoint run that IS each edge's
    support inside the truss.

    Scale: each round is one triangle enumeration + one support agg +
    one filter join, all map-side-combining; the loop-carried edge set
    only shrinks. The degree orientation is computed ONCE from the
    initial graph — any FIXED total vertex order keeps triangle
    enumeration exact on every subgraph, so the loop carries
    already-oriented edges partitioned on the pivot (the wedge
    self-join re-enters exchange-free; per-round degree re-derivation
    would add three O(E) exchanges for only a marginally tighter
    wedge bound after heavy peels). Round count is bounded by the
    peel depth, small on power-law graphs (supports collapse fast);
    ``max_rounds`` caps adversarial chains, trading exactness for
    bounded work (the returned set is then a SUPERSET of the true
    k-truss).
    """
    if k < 3:
        raise ValueError(f"k-truss requires k >= 3: {k}")
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    from .engine import bsp_loop_confs, materialize

    rounds = max_rounds if max_rounds is not None else 10**9
    with bsp_loop_confs(spark):
        ue = undirect(edges).filter(F.col("src") != F.col("dst"))
        canon = (
            ue.filter(F.col("src") < F.col("dst"))
            .select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .distinct()
        )
        deg = (
            canon.select(F.col("u").alias("id"))
            .unionByName(canon.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        u_first = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        e = materialize(
            canon.join(
                deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u"
            )
            .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
            .select(
                F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
                F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
            )
            .repartition(n_part, "a")
        )
        n_edges = e.count()
        have_supp = False
        done = 0
        while done < rounds and n_edges > 0:
            e1 = e.select("a", F.col("b").alias("v"))
            e2 = e.select("a", F.col("b").alias("w"))
            wedges = e1.join(e2, "a").filter(F.col("v") < F.col("w"))
            closer = e.select(
                F.least("a", "b").alias("v"), F.greatest("a", "b").alias("w")
            )
            tris = wedges.join(closer, ["v", "w"], "left_semi")
            credits = (
                tris.select(F.least("a", "v").alias("u"), F.greatest("a", "v").alias("v"))
                .unionByName(
                    tris.select(
                        F.least("a", "w").alias("u"), F.greatest("a", "w").alias("v")
                    )
                )
                .unionByName(
                    tris.select(F.col("v").alias("u"), F.col("w").alias("v"))
                )
            )
            kept = (
                credits.groupBy("u", "v")
                .agg(F.count(F.lit(1)).alias("support"))
                .filter(F.col("support") >= k - 2)
            )
            e = materialize(
                e.select("a", "b")
                .withColumn("u", F.least("a", "b"))
                .withColumn("v", F.greatest("a", "b"))
                .join(kept, ["u", "v"])
                .select("a", "b", "support")
                .repartition(n_part, "a")
            )
            have_supp = True
            done += 1
            n_now = e.count()
            if n_now == n_edges:
                break
            n_edges = n_now
        if not have_supp:  # empty input: keep the 3-column schema
            return e.select(
                F.least("a", "b").alias("u"),
                F.greatest("a", "b").alias("v"),
                F.lit(0).cast("long").alias("support"),
            )
        return e.select(
            F.least("a", "b").alias("u"),
            F.greatest("a", "b").alias("v"),
            "support",
        )


def four_cliques(edges: DataFrame) -> DataFrame:
    """Global 4-clique (K4) census as a 1-row DataFrame (n_quads) —
    the next motif up from triangles (tetrahedral density, a standard
    cohesion signal next to ``butterflies``' bipartite 4-cycles;
    reference scope: §2.9 analytics extras).

    Shape: extend each enumerated triangle (u, v, w) by the pivot's
    ORIENTED out-neighbors ``d`` (one join, fan-out bounded by the
    orientation's arboricity guarantee — never a hub's full
    adjacency), then two semi-joins against the canonical pair set
    check {v, d} and {w, d}; semi-joins only shrink. Exactness of the
    divisor: in a K4 with orientation order a < b < c < d, the faces
    pivot at a, a, a, b; a face extends only through an oriented
    pivot->x edge, so the three a-pivot faces each find the K4 once
    (a precedes everything) and the b-pivot face {b,c,d} never does
    (its extender would need the nonexistent oriented b->a edge) —
    every K4 is counted exactly 3 times, so the census divides by 3.
    Exact on the quad fixture (n-3 consecutive quadruples), matched by
    the 6-way canonical-pair DuckDB oracle.
    """
    from .engine import materialize

    tris = _triangles(edges)
    ce = _oriented(edges)
    canon = materialize(
        ce.select(
            F.least("src", "dst").alias("x"), F.greatest("src", "dst").alias("y")
        )
    )
    ext = tris.join(
        ce.select(F.col("src").alias("u"), F.col("dst").alias("d")), "u"
    ).filter((F.col("d") != F.col("v")) & (F.col("d") != F.col("w")))
    closed = ext.join(
        canon,
        (F.least("v", "d") == F.col("x")) & (F.greatest("v", "d") == F.col("y")),
        "left_semi",
    ).join(
        canon,
        (F.least("w", "d") == F.col("x")) & (F.greatest("w", "d") == F.col("y")),
        "left_semi",
    )
    # integer DIV, not float /: the census is exactly divisible by 3,
    # and a double quotient silently loses exactness above 2^53 —
    # reachable for clique counts on dense subgraphs at corpus scale
    return closed.agg(F.expr("count(1) DIV 3").cast("long").alias("n_quads"))
