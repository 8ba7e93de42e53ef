from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pregel_spark.pipeline import kmeans_assign, kmeans_fit


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _np_kmeans(ids, X, k, iters):
    """The exact algorithm, in NumPy: hash60-ordered init, Lloyd
    updates with empty-cluster carry, tie-break to smaller cluster."""
    order = sorted(range(len(ids)), key=lambda i: (_hash60(str(ids[i])), ids[i]))
    cent = X[order[:k]].astype(np.float64).copy()

    def assign(c):
        d = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)  # argmin takes the FIRST min: smaller id

    for _ in range(iters):
        a = assign(cent)
        for c in range(k):
            m = X[a == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    return assign(cent), cent


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(3, 8)) * 4.0
    rows = []
    for i in range(120):
        v = centers[i % 3] + rng.normal(size=8) * 0.3
        rows.append((i, [float(x) for x in v]))
    return rows


def test_matches_numpy_oracle(spark, emb):
    df = spark.createDataFrame(emb, "vec_id long, embedding array<double>")
    got = {
        r["id"]: r["cluster"]
        for r in kmeans_assign(spark, df, k=4, iters=3).collect()
    }
    ids = [r[0] for r in emb]
    X = np.array([r[1] for r in emb])
    want, _ = _np_kmeans(ids, X, 4, 3)
    assert got == {i: int(c) for i, c in zip(ids, want)}


def test_recovers_planted_clusters(spark, emb):
    df = spark.createDataFrame(emb, "vec_id long, embedding array<double>")
    rows = kmeans_assign(spark, df, k=3, iters=5).collect()
    # planted label = vec_id % 3; assignment must be a pure relabeling
    mapping = {}
    for r in rows:
        mapping.setdefault(r["id"] % 3, set()).add(r["cluster"])
    assert all(len(v) == 1 for v in mapping.values())
    assert len(set.union(*mapping.values())) == 3


def test_partition_invariance(spark, emb):
    df = spark.createDataFrame(emb, "vec_id long, embedding array<double>")
    a = sorted(map(tuple, kmeans_assign(spark, df, k=4, iters=2).collect()))
    b = sorted(
        map(tuple, kmeans_assign(spark, df.repartition(7), k=4, iters=2).collect())
    )
    c = sorted(
        map(tuple, kmeans_assign(spark, df.coalesce(1), k=4, iters=2).collect())
    )
    assert a == b == c


def test_supplied_centroids_and_float_input(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 10.0]), (3, [0.5, -0.5]), (4, [9.0, 11.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["id"]: r["cluster"]
        for r in kmeans_assign(
            spark, df, centroids=[[0.0, 0.0], [10.0, 10.0]]
        ).collect()
    }
    assert got == {1: 0, 3: 0, 2: 1, 4: 1}


def test_empty_cluster_keeps_centroid(spark):
    # k=3 over 3 identical far points + seeds chosen so one cluster
    # empties after the first update: must not divide by zero and the
    # empty cluster keeps its seed centroid
    rows = [(i, [float(i % 2) * 0.01, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = kmeans_fit(spark, df, k=3, iters=2)
    assert len(cent) == 3 and all(len(c) == 2 for c in cent)
    ids = [r[0] for r in rows]
    X = np.array([r[1] for r in rows])
    _, want = _np_kmeans(ids, X, 3, 2)
    assert np.allclose(np.array(cent), want)


def test_empty_corpus_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        kmeans_fit(spark, df, k=2, iters=1)
