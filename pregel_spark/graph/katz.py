"""Truncated Katz centrality: attenuated walk counting.

``katz(v) = Σ_{l=1..k} α^l · walks_l(v)`` where ``walks_l(v)`` is the
number of directed walks of length exactly ``l`` ending at ``v`` —
the classic Katz (1953) index cut off at horizon ``k``, the standard
web-graph variant (full Katz needs the resolvent inverse; bounded-k is
what link-analysis pipelines actually run, cf. truncated PPR).

The reference ships rank loops as vertex programs over its BSP API
(``pregel/vertex.lua`` message rounds); here each level is ONE
gather: an equi-join of the previous level's counts onto edge sources
plus a ``groupBy(dst).sum`` — partial-aggregated map-side, both sides
hash-partitioned on the join key. k levels = k shuffles, no driver
loop state beyond the level index.

Engine portability is by construction: per-level walk counts are
BIGINT-exact (order-independent integer sums), and the final score is
a FIXED-ORDER polynomial ``α·c1 + α²·c2 + … + α^k·ck`` evaluated as
one expression — never a float sum over an unspecified row order — so
any engine computing the same integers produces the bit-identical
double. Overflow headroom: counts < V·maxdeg^k; at web scale with
k=4 and hub degree 10^5 that can exceed int64 — callers at that scale
lower k or pre-cap hub degrees (documented, not hit at test scale).

Scale: edges are deduped once and hash-partitioned once on ``src``;
every level's count table is partitioned on the same key, so the k
joins are co-located; the per-level tables never exceed V rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .build import vertices_from_edges
from .engine import bsp_loop_confs, materialize


def _walk_levels(
    spark: SparkSession, edges: DataFrame, k: int, n_part: int
) -> tuple[DataFrame, list[DataFrame]]:
    """(vertices, [level-1..level-k walk-count tables]) for the directed
    simple graph: level l holds (id, cnt) = exact BIGINT count of
    directed walks of length l ending at id (vertices no walk reaches
    are absent — callers 0-fill via left join). Each level is one
    co-located equi-join (edges static on ``src``, counts re-keyed to
    ``src``) plus a map-side-partial ``groupBy(dst).sum``; k levels =
    k shuffles of at most O(V) count rows.
    """
    with bsp_loop_confs(spark):
        e = materialize(
            edges.select("src", "dst").distinct().repartition(n_part, "src")
        )
        verts = materialize(vertices_from_edges(e).repartition(n_part, "id"))
        # level 1 needs no join: walks_1(v) = in-degree(v)
        cur = materialize(
            e.groupBy(F.col("dst").alias("id"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .repartition(n_part, "id")
        )
        levels = [cur]
        for _ in range(k - 1):
            cur = materialize(
                e.join(cur.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("cnt").alias("cnt"))
                .repartition(n_part, "id")
            )
            levels.append(cur)
    return verts, levels


def katz_centrality(
    spark: SparkSession,
    edges: DataFrame,
    alpha: float = 0.05,
    k: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, katz) for every vertex of the directed simple graph.

    ``katz`` is the fixed-order polynomial over exact per-level walk
    counts (module docstring); vertices no walk reaches score 0.0.
    """
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    verts, levels = _walk_levels(spark, edges, k, n_part)
    out = verts
    terms = []
    for lvl, cdf in enumerate(levels, start=1):
        col = f"_c{lvl}"
        out = out.join(
            cdf.withColumnRenamed("cnt", col), "id", "left_outer"
        )
        terms.append(
            F.lit(float(alpha) ** lvl)
            * F.coalesce(F.col(col), F.lit(0)).cast("double")
        )
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    return out.select("id", score.alias("katz"))


def eigenvector_centrality(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, score) truncated eigenvector centrality of the directed
    simple graph: k steps of the power iteration ``x <- A^T x`` from
    the all-ones vector, L1-normalized at the end.

    With an integer start, the un-normalized iterate is exactly the
    walk census — ``x_k(v) = #(directed walks of length k ending at
    v)`` — so the whole iteration runs in BIGINT (the same per-level
    tables Katz consumes, ``_walk_levels``) and the ONLY float op is
    the final ``cnt / Σcnt``: one IEEE division of two exact 64-bit
    integers, bit-identical in any engine. Normalizing per-step (the
    textbook formulation) would instead thread a float through every
    join, making the result order-dependent; deferring the single
    normalization to the end is algebraically identical because the
    map is linear. Vertices no length-k walk reaches score 0.0; if NO
    length-k walk exists (DAG shallower than k) every score is 0.0
    rather than a 0/0 NaN.

    Same overflow headroom caveat as Katz (counts < V·maxdeg^k).
    Scale: k co-located O(V)-row joins against the statically
    partitioned edge table — identical plan shape to ``pagerank``'s
    superstep, minus the driver convergence action.
    """
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    verts, levels = _walk_levels(spark, edges, k, n_part)
    last = levels[-1]
    total = last.agg(F.sum("cnt").alias("t")).collect()[0]["t"] or 0
    out = verts.join(last, "id", "left_outer")
    if total == 0:
        return out.select("id", F.lit(0.0).alias("score"))
    return out.select(
        "id",
        (
            F.coalesce(F.col("cnt"), F.lit(0)).cast("double")
            / F.lit(float(total))
        ).alias("score"),
    )
