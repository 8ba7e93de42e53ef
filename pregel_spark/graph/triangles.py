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
    """Each undirected edge exactly once, low (deg, id) -> high."""
    ue = undirect(edges).select("src", "dst")
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
    return e


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
    tris = _triangles(edges)
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
