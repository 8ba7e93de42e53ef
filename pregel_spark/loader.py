"""Compatibility reader for the reference's sectioned edge-list format.

The reference loader (``pregel/loader.lua:58-130``) streams a text file
where sections flip on ``#`` lines: section 1 holds vertex lines
``<id> '<name>' <value>`` (Lua pattern ``(%d+) '([^']+)' (%d+)``,
``pregel/loader.lua:98``) and section 2 edge lines ``<src> <dst>
<value>`` (``pregel/loader.lua:105``).

Our reader is order-free: the two line grammars are disjoint (vertex
lines carry quotes), so a plain distributed ``spark.read.text`` +
``regexp_extract`` classifies every line independently — no sectioned
state machine, no driver-side parsing, scales to any file size via
native input splits (the reference's per-worker ``(idx, total)``
sharding, ``pregel/worker.lua:329-332``, for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

VERTEX_RE = r"^\s*(\d+)\s+'([^']+)'\s+(\d+)\s*$"
EDGE_RE = r"^\s*(\d+)\s+(\d+)\s+(\d+)\s*$"


def read_reference_graph(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Returns (vertices(id, name, value), edges(src, dst, weight))."""
    lines = spark.read.text(path)
    vertices = (
        lines.filter(F.col("value").rlike(VERTEX_RE))
        .select(
            F.regexp_extract("value", VERTEX_RE, 1).alias("id"),
            F.regexp_extract("value", VERTEX_RE, 2).alias("name"),
            F.regexp_extract("value", VERTEX_RE, 3).cast("long").alias("value"),
        )
    )
    edges = (
        lines.filter(F.col("value").rlike(EDGE_RE))
        .select(
            F.regexp_extract("value", EDGE_RE, 1).alias("src"),
            F.regexp_extract("value", EDGE_RE, 2).alias("dst"),
            F.regexp_extract("value", EDGE_RE, 3).cast("double").alias("weight"),
        )
    )
    return vertices, edges
