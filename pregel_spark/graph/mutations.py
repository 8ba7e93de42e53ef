"""Topology mutation utilities (the reference's graph DML, SURVEY §2.7).

The reference defers all mutations to the superstep barrier and applies
them in a fixed order — delete-edges, delete-vertices, add-vertices,
add-edges — for deterministic conflict resolution
(``pregel/worker.lua:196-309``; API ``pregel/vertex.lua:140-210``).
``apply_mutations`` reproduces that order over (vertices, edges)
DataFrames; individual ops are exposed for direct use.

All ops are single anti-joins / unions — no custom code paths; at
scale they become Iceberg ``MERGE INTO`` statements against the stored
tables (the logic is identical, the sink differs via tableio).

Note: the reference's cascading delete of a vertex's IN-edges is
asserted unimplemented there (``pregel/vertex.lua:187``); we implement
it properly (delete both directions) rather than replicate the gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can sort/min a column of this type (maps cannot,
    anywhere in the nesting)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def add_vertices(vertices: DataFrame, new: DataFrame) -> DataFrame:
    """M1 (``pregel/vertex.lua:140-147``): insert; an id that already
    exists keeps its CURRENT row (the reference skips the insert with
    'vertex exists'). A plain ``dropDuplicates`` after the union would
    keep an arbitrary row per id — nondeterministic — so only genuinely
    new ids are inserted via anti-join (same pattern as the engine's
    barrier path). Duplicate ids WITHIN one batch resolve
    deterministically too: the kept row is the minimum over the value
    columns' struct (lexicographic field order), not an arbitrary
    partition-dependent pick. Map-typed value columns are not
    orderable in Spark, so tables containing one fall back to
    ``dropDuplicates`` — intra-batch duplicate ids then resolve to an
    unspecified row (conflicts with EXISTING vertices stay
    deterministic either way via the anti-join)."""
    vcols = [c for c in vertices.columns if c != "id"]
    batch = new.select(*vertices.columns)
    if vcols and all(_orderable(vertices.schema[c].dataType) for c in vcols):
        batch = (
            batch.groupBy("id")
            .agg(F.min(F.struct(*vcols)).alias("_s"))
            .select("id", "_s.*")
        )
    else:
        batch = batch.dropDuplicates(["id"])
    return vertices.unionByName(
        batch.join(vertices, "id", "left_anti").select(*vertices.columns)
    )


def add_edges(edges: DataFrame, new: DataFrame) -> DataFrame:
    """M2 (``pregel/vertex.lua:148-173``): append; duplicate (src,dst)
    collapse keeping the existing edge's weight."""
    return (
        edges.withColumn("_ord", F.lit(0))
        .unionByName(new.select(*edges.columns).withColumn("_ord", F.lit(1)))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("src", "dst").orderBy("_ord")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_ord", "_rn")
    )


def delete_vertices(
    vertices: DataFrame, edges: DataFrame, dels: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """M3 (``pregel/vertex.lua:176-192``): drop vertices and ALL their
    incident edges (out- and in-)."""
    d = dels.select("id").distinct()
    v2 = vertices.join(d, "id", "left_anti")
    e2 = (
        edges.join(d.withColumnRenamed("id", "src"), "src", "left_anti")
        .join(d.withColumnRenamed("id", "dst"), "dst", "left_anti")
        .select(*edges.columns)
    )
    return v2, e2


def delete_edges(edges: DataFrame, dels: DataFrame) -> DataFrame:
    """M4 (``pregel/vertex.lua:193-210``): drop exact (src, dst) pairs."""
    return edges.join(
        dels.select("src", "dst").distinct(), ["src", "dst"], "left_anti"
    )


def apply_mutations(
    vertices: DataFrame,
    edges: DataFrame,
    del_edges: DataFrame | None = None,
    del_vertices: DataFrame | None = None,
    new_vertices: DataFrame | None = None,
    new_edges: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Barrier-ordered application (``pregel/worker.lua:196-309``):
    delete-edges -> delete-vertices -> add-vertices -> add-edges."""
    if del_edges is not None:
        edges = delete_edges(edges, del_edges)
    if del_vertices is not None:
        vertices, edges = delete_vertices(vertices, edges, del_vertices)
    if new_vertices is not None:
        vertices = add_vertices(vertices, new_vertices)
    if new_edges is not None:
        edges = add_edges(edges, new_edges)
    return vertices, edges
