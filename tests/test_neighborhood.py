"""Neighborhood function (exact sets + HLL sketches) vs a Python BFS
oracle; effective diameter on graphs with known distance profiles."""

from __future__ import annotations

import numpy as np

from pregel_spark.graph import effective_diameter, neighborhood_function
from tests.conftest import edges_df


def ball_sizes(pairs, radius):
    adj = {}
    verts = set()
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        verts.update((a, b))
    out = {}
    for v in verts:
        seen, frontier = {v}, {v}
        for _ in range(radius):
            frontier = {
                w for u in frontier for w in adj.get(u, ()) if w not in seen
            }
            if not frontier:
                break
            seen |= frontier
        out[v] = len(seen)
    return out


def _rand_pairs(seed, n=40, m=120):
    rng = np.random.default_rng(seed)
    return sorted(
        {
            (f"n{a:02d}", f"n{b:02d}")
            for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
            if a != b
        }
    )


def test_neighborhood_exact_matches_bfs(spark):
    pairs = _rand_pairs(11)
    for radius in (1, 3):
        res = neighborhood_function(
            spark, edges_df(spark, pairs), max_radius=radius, mode="exact"
        )
        got = {r["id"]: int(r["reach"]) for r in res.vertices.collect()}
        assert got == ball_sizes(pairs, radius), f"radius {radius}"
    # N(t) series is the sum of ball sizes per radius
    assert res.metrics[-1]["n_pairs"] == sum(ball_sizes(pairs, 3).values())


def test_neighborhood_exact_converges_early(spark):
    # a 5-chain quiesces at radius 5 even with max_radius much larger
    pairs = [(f"c{i}", f"c{i+1}") for i in range(5)]
    res = neighborhood_function(
        spark, edges_df(spark, pairs), max_radius=30, mode="exact"
    )
    assert res.converged and res.supersteps <= 6
    got = {r["id"]: int(r["reach"]) for r in res.vertices.collect()}
    assert got == {f"c{i}": 6 - i for i in range(6)}


def test_neighborhood_hll_tracks_exact(spark):
    pairs = _rand_pairs(12, n=120, m=500)
    exact = neighborhood_function(
        spark, edges_df(spark, pairs), max_radius=4, mode="exact"
    )
    hll = neighborhood_function(
        spark, edges_df(spark, pairs), max_radius=4, mode="hll", lgk=12
    )
    ex = {r["id"]: r["reach"] for r in exact.vertices.collect()}
    ap = {r["id"]: r["reach"] for r in hll.vertices.collect()}
    assert set(ex) == set(ap)
    rel = max(abs(ap[v] - ex[v]) / ex[v] for v in ex)
    # datasketches HLL is near-exact at these cardinalities (sparse
    # mode); allow generous slack anyway
    assert rel < 0.05, rel


def test_neighborhood_hll_plan_is_native(spark):
    pairs = _rand_pairs(13)
    res = neighborhood_function(
        spark, edges_df(spark, pairs), max_radius=2, mode="hll"
    )
    plan = res.vertices._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_effective_diameter_path_graph(spark):
    # directed 10-path: distances from c0 are 0..9; N(t) grows linearly
    pairs = [(f"c{i}", f"c{i+1}") for i in range(9)]
    d = effective_diameter(spark, edges_df(spark, pairs), q=1.0, mode="exact")
    assert d["converged"]
    assert d["effective_diameter"] == 9.0
    d5 = effective_diameter(spark, edges_df(spark, pairs), q=0.5, mode="exact")
    assert 0 < d5["effective_diameter"] < 9.0
    # N(t) totals: 10 + sum over steps
    assert d["n_pairs"][0] == 10.0 and d["n_pairs"][-1] == 55.0


def test_neighborhood_resume_identical(spark, tmp_path):
    from pregel_spark.tableio import CheckpointManager

    pairs = _rand_pairs(21)
    e = edges_df(spark, pairs)
    full = neighborhood_function(spark, e, max_radius=6, mode="exact")

    ck = str(tmp_path / "ck")
    neighborhood_function(
        spark, e, max_radius=4, mode="exact", checkpoint_dir=ck,
        run_id="r1", checkpoint_interval=2,
    )
    saved = CheckpointManager(ck, "r1").completed_supersteps()
    assert 2 in saved and 4 in saved
    res = neighborhood_function(
        spark, e, max_radius=6, mode="exact", checkpoint_dir=ck,
        run_id="r1", checkpoint_interval=2, resume=True,
    )
    a = {r["id"]: r["reach"] for r in full.vertices.collect()}
    b = {r["id"]: r["reach"] for r in res.vertices.collect()}
    assert a == b
    # per-partition rows sum to the vertex count each superstep
    pm = CheckpointManager(ck, "r1").read_partition_metrics(spark).collect()
    by_step = {}
    for r in pm:
        by_step[r["superstep"]] = by_step.get(r["superstep"], 0) + r["rows"]
    assert by_step and all(v == len(a) for v in by_step.values())


def test_neighborhood_resume_mode_mismatch_raises(spark, tmp_path):
    import pytest

    pairs = _rand_pairs(22)
    e = edges_df(spark, pairs)
    ck = str(tmp_path / "ck")
    neighborhood_function(
        spark, e, max_radius=2, mode="exact", checkpoint_dir=ck,
        run_id="r1", checkpoint_interval=1,
    )
    with pytest.raises(ValueError, match="checkpoint mode"):
        neighborhood_function(
            spark, e, max_radius=4, mode="hll", checkpoint_dir=ck,
            run_id="r1", resume=True,
        )


# --------------------------- harmonic centrality ------------------------


def harmonic_oracle(pairs, radius):
    adj = {}
    verts = set()
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        verts.update((a, b))
    acc = {v: 0.0 for v in verts}
    for u in verts:
        dist = {u: 0}
        frontier = {u}
        for d in range(1, radius + 1):
            frontier = {
                w for x in frontier for w in adj.get(x, ()) if w not in dist
            }
            if not frontier:
                break
            for w in frontier:
                dist[w] = d
                acc[w] += 1.0 / d
    return acc


def test_harmonic_exact_matches_bfs(spark):
    from pregel_spark.graph import harmonic_centrality

    pairs = _rand_pairs(31)
    res = harmonic_centrality(
        spark, edges_df(spark, pairs), max_radius=4, mode="exact"
    )
    got = {r["id"]: r["harmonic"] for r in res.vertices.collect()}
    want = harmonic_oracle(pairs, 4)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v


def test_harmonic_hll_tracks_exact(spark):
    from pregel_spark.graph import harmonic_centrality

    pairs = _rand_pairs(32, n=100, m=400)
    e = edges_df(spark, pairs)
    ex = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(spark, e, max_radius=4, mode="exact")
        .vertices.collect()
    }
    ap = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(spark, e, max_radius=4, mode="hll")
        .vertices.collect()
    }
    # deltas of near-exact sparse-mode estimates; small absolute slack
    assert all(abs(ap[v] - ex[v]) <= max(0.05 * ex[v], 0.5) for v in ex)
