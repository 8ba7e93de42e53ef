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


def semantic_dedup(
    spark: SparkSession,
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the
    embedding space with k-means, then inside each cluster drop every
    vector that has a same-cluster neighbor with cosine >= threshold
    and a smaller id — i.e. keep one greedy-by-id representative per
    epsilon-ball. Clustering first is the whole trick: the quadratic
    pair search runs within clusters only (sum n_c^2 / 2, not n^2 / 2),
    and at scale k grows with the corpus so n_c stays bounded (the
    paper uses ~sqrt-n clusters; for very large clusters compose with
    ``dedup.embedding_near_dup_pairs(mode='lsh')`` per cluster
    instead of the exact join).

    Returns (vec_id, cluster, keep). Deterministic end to end: the
    k-means init/rounds are the engine-portable ``kmeans_fit`` recipe,
    the keep rule compares round(cosine, 6) (same guard as
    ``dedup_embedding``'s oracle — both engines compare the rounded
    value, so a 1-ulp dot-product gap cannot flip a verdict), and the
    keeper choice is min-id, not partition order.

    Scale shape: assignment is a literal-centroid scan (zero shuffle),
    the pair search is ONE self-join keyed on ``cluster`` (skew-bounded
    by the cluster sizes), and the verdict is an aggregation on the
    smaller pair id — no per-row Python anywhere.
    """
    assigned = kmeans_assign(
        spark, corpus, k=k, iters=iters, vec_col=vec_col,
        id_col=id_col, centroids=centroids,
    )
    pts = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).filter(F.col("v").isNotNull())
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("v"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    base = assigned.join(pts, "id").select("id", "cluster", "v", nrm.alias("nrm"))
    a = base.select(
        F.col("id").alias("a"), "cluster",
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = base.select(
        F.col("id").alias("b"), "cluster",
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # a < b: 'b' is dominated (has a smaller-id near-duplicate) — the
    # distinct is on the dominated side only, so one doc dominated via
    # several neighbors still yields one drop row
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("a") < F.col("b"))
        .select(
            "b",
            F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("b")
        .distinct()
    )
    return (
        assigned.join(dropped, assigned["id"] == dropped["b"], "left")
        .select(
            F.col("id").alias("vec_id"),
            "cluster",
            F.col("b").isNull().alias("keep"),
        )
    )
