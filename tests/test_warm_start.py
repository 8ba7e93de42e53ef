"""Warm-start PageRank (initial_ranks): the recrawl pattern.

The recurrence is a d-contraction, so any start vector reaches the
same fixpoint — these tests assert exactly that (value parity with a
cold run at tight tol) plus the point of the feature: far fewer
supersteps when starting near the answer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pregel_spark.graph import pagerank

from conftest import edges_df


def _graph_pairs(n=120):
    pairs = [(f"v{i}", f"v{(i + 1) % n}") for i in range(n)]
    pairs += [(f"v{i}", "v0") for i in range(0, n, 7)]  # hub
    pairs += [(f"v{i}", f"v{(i * 3) % n}") for i in range(0, n, 5)]
    return pairs


def test_warm_start_same_fixpoint_fewer_supersteps(spark):
    e1 = edges_df(spark, _graph_pairs())
    cold1 = pagerank(spark, e1, tol=1e-9, pre_deduped=True)
    # recrawl: a handful of new links appear
    e2 = e1.union(edges_df(spark, [("v3", "v50"), ("v50", "v3"), ("v7", "v99")]))
    cold2 = pagerank(spark, e2, tol=1e-9, pre_deduped=True)
    warm2 = pagerank(
        spark, e2, tol=1e-9, pre_deduped=True, initial_ranks=cold1.vertices
    )
    assert warm2.converged and cold2.converged
    assert warm2.supersteps < cold2.supersteps, (
        warm2.supersteps,
        cold2.supersteps,
    )
    got = {r.id: r.rank for r in warm2.vertices.collect()}
    want = {r.id: r.rank for r in cold2.vertices.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_warm_start_new_and_vanished_vertices(spark):
    e1 = edges_df(spark, _graph_pairs())
    cold1 = pagerank(spark, e1, tol=1e-8, pre_deduped=True)
    # vanished: v0..v9 renamed away; new: w0..w4 appear
    e2 = edges_df(
        spark,
        [(f"x{i}", f"x{(i + 1) % 50}") for i in range(50)]
        + [(f"w{i}", f"x{i}") for i in range(5)],
    )
    warm2 = pagerank(
        spark, e2, tol=1e-8, pre_deduped=True, initial_ranks=cold1.vertices
    )
    ids = {r.id for r in warm2.vertices.collect()}
    assert all(i.startswith(("x", "w")) for i in ids)  # vanished ids dropped
    assert {f"w{i}" for i in range(5)} <= ids  # new ids present
    mass = warm2.vertices.agg(F.sum("rank")).first()[0]
    assert mass == pytest.approx(1.0, abs=1e-9)


def test_warm_start_personalized(spark):
    e = edges_df(spark, _graph_pairs())
    srcs = ["v0", "v1"]
    cold = pagerank(spark, e, tol=1e-9, pre_deduped=True, sources=srcs)
    warm = pagerank(
        spark,
        e,
        tol=1e-9,
        pre_deduped=True,
        sources=srcs,
        initial_ranks=cold.vertices,
    )
    assert warm.supersteps < cold.supersteps
    got = {r.id: r.rank for r in warm.vertices.collect()}
    want = {r.id: r.rank for r in cold.vertices.collect()}
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_warm_start_duplicate_ids_no_fanout(spark):
    # duplicate ids in initial_ranks must not fan out the vertex table
    # or inflate rank mass; resolution is deterministic (max)
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    warm = spark.createDataFrame(
        [("a", 0.7), ("a", 0.1), ("b", 0.1), ("c", 0.2)], "id string, rank double"
    )
    res = pagerank(
        spark, edges_df(spark, pairs), tol=1e-9, max_iter=50, initial_ranks=warm
    )
    rows = res.vertices.collect()
    assert len(rows) == len({r["id"] for r in rows}) == 3
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-9
