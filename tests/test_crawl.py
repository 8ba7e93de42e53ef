"""Recrawl delta + rank shift vs dict/NumPy oracles."""

from __future__ import annotations

import numpy as np
import pytest

from pregel_spark.graph import crawl_delta, rank_shift

OLD = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("x", "y")]
NEW = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "a")]


def _df(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_crawl_delta_statuses(spark):
    got = {
        (r.src, r.dst): r.status
        for r in crawl_delta(_df(spark, OLD), _df(spark, NEW)).collect()
    }
    assert got == {
        ("a", "b"): "kept", ("b", "c"): "kept", ("c", "a"): "kept",
        ("a", "c"): "removed", ("x", "y"): "removed",
        ("a", "d"): "added", ("d", "a"): "added",
    }


def test_crawl_delta_dedups_arcs(spark):
    got = crawl_delta(_df(spark, OLD + OLD), _df(spark, NEW + NEW)).count()
    assert got == 7  # one row per distinct arc


def test_rank_shift_outer_semantics(spark):
    rows = {r.id: r for r in rank_shift(spark, _df(spark, OLD), _df(spark, NEW), max_iter=4).collect()}
    # vertices only in old: rank_new/shift NULL; only in new: rank_old/shift NULL
    assert rows["x"].rank_new is None and rows["x"].shift is None
    assert rows["d"].rank_old is None and rows["d"].shift is None
    # common vertices: shift == rank_new - rank_old, exact vs two dense runs
    def power(pairs, k):
        ids = sorted({v for e in pairs for v in e})
        idx = {v: i for i, v in enumerate(ids)}
        from collections import defaultdict
        out = defaultdict(set)
        for s, t in set(pairs):
            out[s].add(t)
        n, dmp = len(ids), 0.85
        r = np.full(n, 1.0 / n)
        for _ in range(k):
            nxt = np.zeros(n)
            dm = 0.0
            for v in ids:
                if out[v]:
                    for t in out[v]:
                        nxt[idx[t]] += r[idx[v]] / len(out[v])
                else:
                    dm += r[idx[v]]
            r = (1 - dmp) / n + dmp * (nxt + dm / n)
        return {v: r[idx[v]] for v in ids}
    po, pn = power(OLD, 4), power(NEW, 4)
    for v in ("a", "b", "c"):
        assert np.isclose(rows[v].rank_old, po[v], atol=1e-12)
        assert np.isclose(rows[v].rank_new, pn[v], atol=1e-12)
        assert np.isclose(rows[v].shift, pn[v] - po[v], atol=1e-12)


def test_incremental_components_equals_full_recompute(spark):
    from pregel_spark.graph import connected_components, incremental_components

    rng = np.random.default_rng(11)
    # two random blobs that the delta then bridges, plus brand-new vertices
    old = [(f"v{a}", f"v{b}") for a, b in rng.integers(0, 30, (60, 2)) if a != b]
    old += [(f"w{a}", f"w{b}") for a, b in rng.integers(0, 30, (60, 2)) if a != b]
    delta = [("v0", "w0"), ("w1", "z0"), ("z0", "z1"), ("q5", "q6")]
    prior = connected_components(spark, _df(spark, old)).vertices
    inc = {
        r.id: r.component
        for r in incremental_components(spark, prior, _df(spark, delta)).vertices.collect()
    }
    full = {
        r.id: r.component
        for r in connected_components(spark, _df(spark, old + delta)).vertices.collect()
    }
    assert inc == full


def test_incremental_components_no_delta_is_identity(spark):
    from pregel_spark.graph import connected_components, incremental_components

    prior = connected_components(spark, _df(spark, OLD)).vertices
    empty = spark.createDataFrame([], "src string, dst string")
    got = {
        r.id: r.component
        for r in incremental_components(spark, prior, empty).vertices.collect()
    }
    assert got == {r.id: r.component for r in prior.collect()}


def test_crawl_frontier_scores_caps_and_budget(spark):
    from pregel_spark.graph import crawl_frontier
    from pyspark.sql import functions as F

    # crawled pages a,b,c link into uncrawled u1..u4 on two hosts
    edges = _df(
        spark,
        [("a", "u1"), ("b", "u1"), ("c", "u1"),     # u1: score 3
         ("a", "u2"), ("b", "u2"),                  # u2: score 2
         ("a", "u3"),                               # u3: score 1
         ("c", "u4"), ("c", "u4"),                  # dup arc counts once
         ("a", "b")],                               # b is crawled -> excluded
    )
    crawled = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    host = lambda c: F.substring(c, 1, 1)  # all of u1..u4 share host 'u'
    got = {
        r.url: (r.host, r.score, r.host_rank)
        for r in crawl_frontier(edges, crawled, host_fn=host, per_host_cap=3).collect()
    }
    # tie at score 1 broken by url asc: u3 ranks 3, u4 dropped by cap=3
    assert got == {"u1": ("u", 3, 1), "u2": ("u", 2, 2), "u3": ("u", 1, 3)}
    # budget: global top-2
    top = crawl_frontier(edges, crawled, host_fn=host, per_host_cap=4, budget=2)
    assert sorted(r.url for r in top.collect()) == ["u1", "u2"]


def test_crawl_frontier_default_host_is_identity(spark):
    from pregel_spark.graph import crawl_frontier

    edges = _df(spark, [("a", "u1"), ("b", "u1"), ("a", "u2")])
    crawled = spark.createDataFrame([("a",), ("b",)], "id string")
    rows = {r.url: r for r in crawl_frontier(edges, crawled).collect()}
    assert rows["u1"].host == "u1" and rows["u1"].host_rank == 1
    assert rows["u2"].host == "u2" and rows["u2"].host_rank == 1
