"""Deterministic random-walk corpus generation (DeepWalk / node2vec
input) — the training-data-pipeline × graph-engine composition.

Embedding trainers consume a corpus of vertex walks; at 10^12
documents that corpus must be produced distributed, reproducibly, and
without per-row Python. Spark-first design:

- the adjacency is the CSR view (``groupBy(src)`` + deterministic
  ``sort_array(collect_set(dst))``), hash-partitioned on ``src`` and
  persisted — the static side of every step join;
- each step is ONE join + a native next-vertex pick:
  ``next = nbrs[H(seed, start, walk, step, cur) % deg]`` where H is
  the engine-portable 60-bit md5 hash (``pipeline/hashing.py``) — the
  walk is a pure function of (seed, start, walk_no), so reruns,
  resumes, and *other engines* reproduce it bit-identically (the
  ``random_walks_l3`` contract row unrolls the same picks in DuckDB);
  no RNG state, no Python in the row path;
- walks that reach a dangling vertex (no out-edges) simply end — the
  inner join against the adjacency drops them, and shorter walks are
  legitimate corpus entries (word2vec-style consumers pad/clip);
- the walk frontier is O(V * walks_per_vertex) rows that re-shuffle
  on ``cur`` each step (inherent: a walk hops to an arbitrary
  partition); per-step state is materialized so the plan stays flat
  for long walks.

Returns long format ``(start, walk, step, id)`` — step 0 is the start
vertex; one row per visited position. ``F.collect_list`` over a
window, or a ``groupBy(start, walk)`` with ``sort_array``, folds it
to path arrays when a trainer wants one row per walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline.hashing import hash60
from .build import vertices_from_edges
from .engine import bsp_loop_confs, materialize


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int = 4,
    walks_per_vertex: int = 1,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic uniform random walks from every vertex.

    ``walk_length`` = number of hops (a full walk visits
    ``walk_length + 1`` vertices); ``walks_per_vertex`` independent
    walks start at each vertex, distinguished by ``walk`` in
    [0, walks_per_vertex). The neighbor pick at step t from vertex v
    is ``nbrs_sorted[hash60(seed:start:walk:t:v) % deg]`` — uniform per
    step, independent across (start, walk, t), and reproducible on any
    engine with md5.
    """
    if walk_length < 0 or walks_per_vertex < 1:
        raise ValueError("walk_length >= 0 and walks_per_vertex >= 1 required")
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    adj = (
        edges.groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
        .withColumn("deg", F.size("nbrs"))
        .repartition(n_part, "src")
        .persist()
    )
    adj.count()

    cur = materialize(
        vertices_from_edges(edges)
        .select(
            F.col("id").alias("start"),
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))
            ).alias("walk"),
            F.col("id").alias("cur"),
        )
        .repartition(n_part, "cur")
    )
    outputs = [
        cur.select(
            "start", "walk", F.lit(0).alias("step"), F.col("cur").alias("id")
        )
    ]
    with bsp_loop_confs(spark):
        for t in range(1, walk_length + 1):
            pick_key = F.concat_ws(
                ":",
                F.lit(str(seed)),
                F.col("start"),
                F.col("walk").cast("string"),
                F.lit(str(t)),
                F.col("cur"),
            )
            idx = (hash60(pick_key) % F.col("deg")).cast("int") + 1
            cur = materialize(
                cur.join(adj, cur["cur"] == adj["src"])
                .select(
                    "start",
                    "walk",
                    F.element_at("nbrs", idx).alias("cur"),
                )
                .repartition(n_part, "cur")
            )
            outputs.append(
                cur.select(
                    "start",
                    "walk",
                    F.lit(t).alias("step"),
                    F.col("cur").alias("id"),
                )
            )

    out = outputs[0]
    for df in outputs[1:]:
        out = out.unionByName(df)
    # every per-step output projects a materialized checkpoint, so the
    # static adjacency is no longer referenced
    adj.unpersist()
    return out
