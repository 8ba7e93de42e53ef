"""Distributed Lloyd k-means over an embedding column.

The IVF coarse quantizer (``simsearch.fit_centroids``) trains on a
driver-side SAMPLE; this module is the full-corpus variant a curation
pipeline needs when the cluster assignment itself is the product
(topic bucketing, diversity-stratified sampling, dedup-within-cluster).
The reference engine has no vector ops at all — this is part of the
beyond-reference training-data surface the round brief asks for.

Scale shape (per iteration, for corpus of N vectors, k clusters,
d dims):

- centroids live on the DRIVER as a k x d list and enter the plan as
  LITERAL arrays — no join, no broadcast table, nothing shuffled for
  the assignment side;
- the update is ONE ``groupBy(cluster).agg(count + d column sums)``
  with map-side partial aggregation: each task emits at most k rows of
  d+1 doubles, so the shuffle is ``partitions * k * (d+1) * 8`` bytes
  regardless of N — at 100 TB the iteration cost is one scan plus a
  few kilobytes of exchange;
- assignment distances are higher-order-function expressions
  (``zip_with`` + ``aggregate``) evaluated JVM-side per row; no Python
  anywhere.

The literal-centroid trick sizes the PLAN by k*d, so it is the right
strategy for k up to a few hundred (the curation regime). For k in
the tens of thousands (ANN quantizers) use ``simsearch.fit_centroids``
+ ``write_ivf_index``, which broadcast-join a centroid TABLE instead.

Determinism: init picks the k rows with the smallest engine-portable
``hash60(cast(id as string))`` (ties by id), so any SQL engine — the
DuckDB oracle in ``__spark_entry__`` runs the identical two Lloyd
rounds — reproduces the exact cluster assignment; all arithmetic is
double-precision on both sides (float noise between engines is ~1e-14
relative, far from any argmin boundary on real data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .hashing import hash60


def _dist2(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance from ``vec`` (array<double>) to a literal."""
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign_col(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin cluster id; ties break to the smaller cluster id via the
    lexicographic struct min."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _dist2(vec, c).alias("d"), F.lit(ci).alias("c")
                )
                for ci, c in enumerate(centroids)
            ]
        )
    )["c"]


def kmeans_fit(
    spark: SparkSession,
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Run ``iters`` full-corpus Lloyd updates; return the k x d
    centroid list. Empty clusters keep their previous centroid."""
    pts = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).filter(F.col("v").isNotNull())
    seed_rows = (
        pts.orderBy(hash60(F.col("id").cast("string")), "id")
        .limit(k)
        .collect()
    )
    if not seed_rows:
        raise ValueError("kmeans_fit: empty corpus")
    centroids = [list(r["v"]) for r in seed_rows]
    d = len(centroids[0])
    sums = [
        F.sum(F.element_at("v", i + 1)).alias(f"s{i}") for i in range(d)
    ]
    for _ in range(iters):
        agg = (
            pts.select(_assign_col(F.col("v"), centroids).alias("cl"), "v")
            .groupBy("cl")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .collect()
        )
        for row in agg:
            centroids[row["cl"]] = [
                row[f"s{i}"] / row["n"] for i in range(d)
            ]
    return centroids


def kmeans_assign(
    spark: SparkSession,
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Cluster assignment ``(id, cluster)`` after ``iters`` Lloyd
    rounds (or under user-supplied ``centroids``)."""
    if centroids is None:
        centroids = kmeans_fit(
            spark, corpus, k=k, iters=iters, vec_col=vec_col, id_col=id_col
        )
    pts = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).filter(F.col("v").isNotNull())
    return pts.select("id", _assign_col(F.col("v"), centroids).alias("cluster"))
