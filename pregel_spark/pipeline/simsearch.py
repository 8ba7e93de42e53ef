"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: exact cosine top-k — broadcast the (small)
  query set against the full corpus; the dot product is a native
  ``zip_with`` + ``aggregate`` expression (JVM, codegen), the top-k a
  per-query window. The correctness baseline and the right plan when
  |queries| is small: one scan, no shuffle of the corpus.
- ``ivf_topk``: IVF-style scale path — k-means centroids fitted
  driver-side on a seeded sample (numpy), assignment via an
  Arrow-batched pandas UDF (matrix multiply per batch), search
  restricted to the ``nprobe`` nearest centroids per query.
- ``write_ivf_index`` / ``ivf_topk_indexed``: the static-corpus 100 TB
  path — assign once, write parquet partitioned by ``centroid``;
  queries prune the scan to the probed bucket directories (classic
  IVF inverted lists as partition pruning).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import IntegerType


def _norm_col(vec: str):
    return F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )


def _dot_cols(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, score, rank) — exact cosine top-k.
    Self-matches (same id) excluded. Deterministic tie-break by
    neighbor id."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm_col(vec_col).alias("cnorm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm_col(vec_col).alias("qnorm"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot_cols("qvec", "cvec")
                / (F.col("qnorm") * F.col("cnorm")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def fit_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Plain k-means on a deterministic driver-side sample (the IVF
    coarse quantizer).

    Sampling: a content-hash Bernoulli filter (``xxhash64(vec) pmod M <
    threshold``, 4x oversampled) prunes the corpus BEFORE the
    hash-ordered exact limit, so the TakeOrdered pass touches
    ~4*sample rows instead of the full corpus (a pure
    ``orderBy(hash).limit`` is already TakeOrdered — no global sort —
    but still deserializes every vector at 100 TB). Because the
    predicate is a pure function of row CONTENT (unlike ``df.sample``,
    which draws per-partition), the pick — hence the centroids — is
    identical under any repartitioning of the corpus. The one
    ``count()`` job sizes the filter fraction; if the Bernoulli pass
    undershoots, fall back to the full scan."""
    n = corpus.count()
    pruned = corpus.select(vec_col)
    if n > sample * 4:
        _M = 1_000_000
        thresh = int(min(1.0, (sample * 4) / n) * _M)
        pruned = pruned.filter(
            F.pmod(
                F.xxhash64(F.col(vec_col).cast("string")), F.lit(_M)
            ) < thresh
        )
    rows = (
        pruned.orderBy(F.xxhash64(F.col(vec_col).cast("string")))
        .limit(sample)
        .collect()
    )
    if len(rows) < min(sample, n):  # Bernoulli undershoot: exact fallback
        rows = (
            corpus.select(vec_col)
            .orderBy(F.xxhash64(F.col(vec_col).cast("string")))
            .limit(sample)
            .collect()
        )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = X[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    return cent


def assign_centroids(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding, centroid) via Arrow-batched matrix multiply."""
    cent = centroids.astype(np.float64)

    @F.pandas_udf(IntegerType())
    def _assign(v: pd.Series) -> pd.Series:
        X = np.array(v.tolist(), dtype=np.float64)
        if len(X) == 0:
            return pd.Series([], dtype="int32")
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return corpus.select(
        F.col(id_col), F.col(vec_col), _assign(F.col(vec_col)).alias("centroid")
    )


def _probe_sets(
    queries: DataFrame,
    centroids: np.ndarray,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> list[tuple[int, list[int]]]:
    """(query_id, nprobe nearest centroid ids) — tiny; driver-side."""
    qrows = queries.select(id_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    d = ((Q[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    return [
        (int(qid), [int(c) for c in np.argsort(dd)[:nprobe]])
        for qid, dd in zip(qids, d)
    ]


def _topk_over_assigned(
    assigned: DataFrame,
    queries: DataFrame,
    probe_rows: list[tuple[int, list[int]]],
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Score each query against its probed centroid buckets of an
    already-assigned corpus (id, vec, centroid); exact verify inside
    the buckets."""
    spark = assigned.sparkSession
    probes = spark.createDataFrame(
        probe_rows, "query_id long, probe array<int>"
    ).select("query_id", F.explode("probe").alias("centroid"))
    qdf = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm_col(vec_col).alias("qnorm"),
    ).join(probes, "query_id")

    scored = (
        assigned.withColumnRenamed(id_col, "neighbor_id")
        .withColumnRenamed(vec_col, "cvec")
        .join(F.broadcast(qdf), "centroid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot_cols("qvec", "cvec")
                / (F.col("qnorm") * _norm_col("cvec")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate cosine top-k searching only the nprobe nearest
    centroid buckets per query. Same output schema as brute_force_topk.

    Assignment is recomputed inline per call — right for ad-hoc
    corpora; a STATIC corpus should be assigned once with
    :func:`write_ivf_index` and queried with :func:`ivf_topk_indexed`,
    whose scan prunes to the probed centroid partitions."""
    if centroids is None:
        centroids = fit_centroids(corpus, n_centroids, vec_col=vec_col)
    assigned = assign_centroids(corpus, centroids, id_col, vec_col)
    probe_rows = _probe_sets(queries, centroids, nprobe, id_col, vec_col)
    return _topk_over_assigned(assigned, queries, probe_rows, k, id_col, vec_col)


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """The IVF 100 TB path, step 1: assign the corpus ONCE and write it
    parquet-partitioned by ``centroid`` (``<path>/corpus/centroid=i/``)
    plus a centroid sidecar table (``<path>/centroids``). Queries then
    read back via :func:`ivf_topk_indexed`, whose partition filter
    prunes the scan to the probed buckets — the classic IVF inverted
    list, expressed as parquet partition pruning. Returns the fitted
    centroids."""
    spark = corpus.sparkSession
    if centroids is None:
        centroids = fit_centroids(corpus, n_centroids, vec_col=vec_col)
    assigned = assign_centroids(corpus, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("centroid").parquet(
        f"{path}/corpus"
    )
    spark.createDataFrame(
        [(i, c.tolist()) for i, c in enumerate(centroids)],
        "centroid int, cvec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return np.asarray(centroids, dtype=np.float64)


def ivf_topk_indexed(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF 100 TB path, step 2: query a :func:`write_ivf_index`
    layout. The static ``centroid IN (probed)`` filter reaches the
    parquet scan as a partition filter, so only the probed bucket
    directories are read (verified by an input_file_name() test) —
    results are identical to inline :func:`ivf_topk` with the same
    centroids."""
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    centroids = np.array(
        [r["cvec"] for r in sorted(cent_rows, key=lambda r: r["centroid"])],
        dtype=np.float64,
    )
    probe_rows = _probe_sets(queries, centroids, nprobe, id_col, vec_col)
    probed = sorted({c for _, cs in probe_rows for c in cs})
    assigned = spark.read.parquet(f"{path}/corpus").filter(
        F.col("centroid").isin(probed)
    )
    return _topk_over_assigned(assigned, queries, probe_rows, k, id_col, vec_col)
