"""Temporal earliest-arrival reachability + the 4-clique census.

Oracles are naive Python fixpoints / itertools enumerations
(FIXTURES.md §6 style)."""

from __future__ import annotations

import itertools

from conftest import edges_df
from graphs import CLIQUE_BRIDGE

from pregel_spark.graph import earliest_arrival, four_cliques


# (src, dst, t): a is the start; the b->c@1 edge departs BEFORE the
# a->b@2 arrival, so c is reachable only through the later b->c@5
# copy; e is unreachable in time (its only in-edge departs at 1 < 3);
# parallel arcs d->f at 9 and 7 must min-combine to 7
TEMPORAL_FIXTURE = [
    ("a", "b", 2.0),
    ("b", "c", 1.0),
    ("b", "c", 5.0),
    ("c", "d", 5.0),
    ("b", "d", 3.0),
    ("d", "e", 1.0),
    ("d", "f", 9.0),
    ("d", "f", 7.0),
    ("x", "a", 0.0),
]


def naive_earliest(tedges, sources, t0, strict=False):
    arr = {s: t0 for s in sources}
    changed = True
    while changed:
        changed = False
        for u, v, t in tedges:
            if u in arr and (t > arr[u] if strict else t >= arr[u]):
                if v not in arr or t < arr[v]:
                    arr[v] = t
                    changed = True
    return arr


def tedges_df(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, t double")


def test_earliest_arrival_matches_naive(spark):
    res = earliest_arrival(
        spark, tedges_df(spark, TEMPORAL_FIXTURE), ["a"], t0=0.0
    )
    got = {r["id"]: r["arrival"] for r in res.vertices.collect()}
    want = naive_earliest(TEMPORAL_FIXTURE, ["a"], 0.0)
    assert res.converged
    for v in ["a", "b", "c", "d", "e", "f", "x"]:
        assert got[v] == want.get(v), (v, got[v], want.get(v))
    # the interesting facts the fixture encodes, pinned explicitly
    assert got["c"] == 5.0  # the t=1 copy of b->c departs too early
    assert got["f"] == 7.0  # parallel arcs min-combine
    assert got["e"] is None  # reachable in the static graph, not in time
    assert got["x"] is None  # upstream of the source


def test_earliest_arrival_strict_vs_loose(spark):
    # chain with equal timestamps: loose mode hops through, strict stops
    rows = [("a", "b", 3.0), ("b", "c", 3.0)]
    loose = earliest_arrival(spark, tedges_df(spark, rows), ["a"], t0=0.0)
    strict = earliest_arrival(
        spark, tedges_df(spark, rows), ["a"], t0=0.0, strict=True
    )
    lg = {r["id"]: r["arrival"] for r in loose.vertices.collect()}
    sg = {r["id"]: r["arrival"] for r in strict.vertices.collect()}
    assert lg["c"] == 3.0
    assert sg["b"] == 3.0 and sg["c"] is None


def test_earliest_arrival_k_cap_is_k_rounds(spark):
    # monotone relaxation: a k-capped run equals the k-round fixpoint
    # prefix (the property the unrolled contract oracle relies on)
    rows = [("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 3.0)]
    res = earliest_arrival(spark, tedges_df(spark, rows), ["a"], t0=0.0, max_iter=2)
    got = {r["id"]: r["arrival"] for r in res.vertices.collect()}
    assert got["b"] == 1.0 and got["c"] == 2.0 and got["d"] is None


def brute_k4(pairs):
    adj = set()
    verts = set()
    for a, b in pairs:
        if a != b:
            adj.add((min(a, b), max(a, b)))
            verts.update((a, b))
    n = 0
    for quad in itertools.combinations(sorted(verts), 4):
        if all(
            (min(x, y), max(x, y)) in adj
            for x, y in itertools.combinations(quad, 2)
        ):
            n += 1
    return n


def test_four_cliques_clique_bridge(spark):
    # K5 holds C(5,4)=5 quads, the K4 one, the bridge none
    df = edges_df(spark, CLIQUE_BRIDGE)
    assert four_cliques(df).collect()[0]["n_quads"] == 6 == brute_k4(CLIQUE_BRIDGE)


def test_four_cliques_circulant(spark):
    # circulant offsets {1,2,3} on 12 vertices: each consecutive
    # quadruple is a K4 -> 9; brute force confirms no others
    pairs = [
        (f"c{i:02d}", f"c{i + k:02d}") for i in range(12) for k in (1, 2, 3)
        if i + k < 12
    ]
    df = edges_df(spark, pairs)
    assert four_cliques(df).collect()[0]["n_quads"] == 9 == brute_k4(pairs)


def test_four_cliques_none(spark):
    # a triangle has no K4; directed duplicates/self-loops are absorbed
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a")]
    df = edges_df(spark, pairs)
    assert four_cliques(df).collect()[0]["n_quads"] == 0


def test_temporal_edges_from_pages(spark, tmp_path):
    # crawl corpus -> temporal arcs: same links as edges_from_pages,
    # each stamped with its page's warc_ts; recrawls would add arcs
    from pregel_spark.corpus import write_pages
    from pregel_spark.graph import (
        earliest_arrival,
        edges_from_pages,
        temporal_edges_from_pages,
    )
    from pyspark.sql import functions as F

    p = write_pages(str(tmp_path / "pages.parquet"), n_pages=120, seed=3)
    pages = spark.read.parquet(p)
    te = temporal_edges_from_pages(pages)
    assert te.columns == ["src", "dst", "t"]
    # arc set matches the static extraction (this corpus has no
    # duplicate links within a page, so multiplicities line up too)
    static = {(r["src"], r["dst"]) for r in edges_from_pages(pages).collect()}
    temporal = {(r["src"], r["dst"]) for r in te.collect()}
    assert temporal == static
    # every t is the page's own warc_ts
    ts = {r["url"]: r["warc_ts"].timestamp() for r in pages.collect()}
    for r in te.collect():
        assert r["t"] == ts[r["src"]]
    # and the composition runs end-to-end
    src0 = te.agg(F.min("src").alias("m")).collect()[0]["m"]
    res = earliest_arrival(spark, te, [src0], t0=0.0)
    assert res.converged
    assert res.vertices.filter(F.col("arrival").isNotNull()).count() >= 1
