"""Algorithm correctness vs pure-Python/NumPy oracles (FIXTURES.md §6):
PageRank allclose 1e-6, CC/LPA/triangles/maxprop exact."""

from __future__ import annotations

import numpy as np

from pregel_spark.graph import (
    connected_components,
    label_propagation,
    max_propagation,
    pagerank,
    triangle_count,
    triangle_count_per_vertex,
)
from tests.conftest import edges_df
from tests.graphs import (
    CLIQUE_BRIDGE,
    DANGLING_CHAIN,
    TOY7,
    components_oracle,
    lpa_oracle,
    maxprop_oracle,
    pagerank_oracle,
    powerlaw_hub,
    triangles_oracle,
    two_components,
)


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def assert_pagerank_matches(spark, pairs, **kw):
    res = pagerank(spark, edges_df(spark, pairs), tol=1e-9, max_iter=200, **kw)
    got = _ranks(res.vertices)
    want = pagerank_oracle(pairs, tol=1e-12)
    assert set(got) == set(want)
    for v in want:
        assert np.isclose(got[v], want[v], atol=1e-6), (v, got[v], want[v])
    assert res.converged


def test_pagerank_toy7(spark):
    assert_pagerank_matches(spark, TOY7)


def test_pagerank_dangling(spark):
    # d and e are sinks: exercises the dangling-mass aggregator (A3)
    assert_pagerank_matches(spark, DANGLING_CHAIN)


def test_pagerank_two_components(spark):
    assert_pagerank_matches(spark, two_components(n=30))


def test_pagerank_salted_equals_plain(spark):
    pairs = powerlaw_hub(n=300)
    e = edges_df(spark, pairs)
    plain = pagerank(spark, e, tol=0.0, max_iter=5)
    salted = pagerank(spark, e, tol=0.0, max_iter=5, use_salted=True)
    g1, g2 = _ranks(plain.vertices), _ranks(salted.vertices)
    assert set(g1) == set(g2)
    for v in g1:
        assert np.isclose(g1[v], g2[v], atol=1e-12)


def test_pagerank_fixed_k_matches_oracle_k(spark):
    res = pagerank(spark, edges_df(spark, TOY7), tol=0.0, max_iter=3)
    want = pagerank_oracle(TOY7, k=3)
    got = _ranks(res.vertices)
    for v in want:
        assert np.isclose(got[v], want[v], atol=1e-12), v
    assert res.supersteps == 3


def test_connected_components(spark):
    for pairs in (TOY7, two_components(n=30), CLIQUE_BRIDGE):
        res = connected_components(spark, edges_df(spark, pairs))
        got = {r["id"]: r["component"] for r in res.vertices.collect()}
        assert got == components_oracle(pairs)
        assert res.converged


def test_label_propagation(spark):
    for pairs in (TOY7, CLIQUE_BRIDGE):
        res = label_propagation(spark, edges_df(spark, pairs), max_iter=10)
        got = {r["id"]: r["label"] for r in res.vertices.collect()}
        assert got == lpa_oracle(pairs, max_iter=10)


def test_label_propagation_modes_equivalent(spark):
    # frontier (decremental counts) must equal rescatter AND the naive
    # oracle label-for-label, including on graphs where the frontier
    # shrinks gradually (powerlaw hub) and where ties matter (cliques)
    for pairs in (TOY7, CLIQUE_BRIDGE, powerlaw_hub(n=120), two_components(n=20)):
        e = edges_df(spark, pairs)
        want = lpa_oracle(pairs, max_iter=6)
        by_mode = {}
        for mode in ("frontier", "rescatter"):
            res = label_propagation(spark, e, max_iter=6, mode=mode)
            by_mode[mode] = {
                r["id"]: r["label"] for r in res.vertices.collect()
            }
            assert by_mode[mode] == want, mode
        assert by_mode["frontier"] == by_mode["rescatter"]


def test_triangles_clique_bridge(spark):
    e = edges_df(spark, CLIQUE_BRIDGE)
    n = triangle_count(e).collect()[0]["n_triangles"]
    assert n == 14  # K5=10 + K4=4, bridge adds 0
    per = {r["id"]: r["triangles"] for r in triangle_count_per_vertex(e).collect()}
    _, want = triangles_oracle(CLIQUE_BRIDGE)
    assert per == want


def test_triangles_toy_and_powerlaw(spark):
    for pairs in (TOY7, powerlaw_hub(n=200)):
        e = edges_df(spark, pairs)
        total, per = triangles_oracle(pairs)
        assert triangle_count(e).collect()[0]["n_triangles"] == total
        got = {
            r["id"]: r["triangles"]
            for r in triangle_count_per_vertex(e).collect()
        }
        assert got == per


def test_max_propagation_generic_tier(spark):
    # values: deterministic per vertex; oracle = per-component max
    pairs = TOY7
    ids = sorted({x for e in pairs for x in e})
    values = {v: (i * 37) % 101 for i, v in enumerate(ids)}
    vdf = spark.createDataFrame(
        [(v, values[v]) for v in ids], "id string, value long"
    )
    res = max_propagation(spark, vdf, edges_df(spark, pairs))
    got = {r["id"]: r["value"] for r in res.vertices.collect()}
    assert got == maxprop_oracle(pairs, values)
    assert res.converged


def test_pagerank_weighted(spark):
    """Weighted PageRank vs a dense NumPy oracle: rank flows
    proportionally to edge weight (reference edge values)."""
    wedges = [
        ("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0),
        ("c", "a", 1.0), ("c", "d", 1.0), ("d", "a", 5.0),
    ]
    e = spark.createDataFrame(wedges, "src string, dst string, weight double")
    res = pagerank(spark, e, tol=1e-9, max_iter=200, weighted=True)
    got = _ranks(res.vertices)

    ids = sorted({x for s, t, _ in wedges for x in (s, t)})
    idx = {v: i for i, v in enumerate(ids)}
    n, d = len(ids), 0.85
    import numpy as _np

    W = _np.zeros((n, n))
    for s, t, w in wedges:
        W[idx[s], idx[t]] += w
    out = W.sum(axis=1)
    r = _np.full(n, 1.0 / n)
    for _ in range(10_000):
        nxt = _np.zeros(n)
        dm = 0.0
        for i in range(n):
            if out[i] > 0:
                nxt += r[i] * W[i] / out[i]
            else:
                dm += r[i]
        new = (1 - d) / n + d * (nxt + dm / n)
        if _np.abs(new - r).max() < 1e-12:
            r = new
            break
        r = new
    for v in ids:
        assert np.isclose(got[v], r[idx[v]], atol=1e-6), v
    assert res.converged


def test_cc_star_matches_union_find_and_converges_fast(spark):
    """Alternating star CC: identical labels to the union-find oracle,
    and O(log n) rounds on a high-diameter graph where min-label would
    need O(n) supersteps."""
    from pregel_spark.graph import connected_components_star

    for pairs in (TOY7, CLIQUE_BRIDGE, two_components(n=25)):
        res = connected_components_star(spark, edges_df(spark, pairs))
        got = {r["id"]: r["component"] for r in res.vertices.collect()}
        assert got == components_oracle(pairs), pairs[:3]
        assert res.converged

    # path of 120 nodes: diameter 119 -> min-label needs ~120 rounds,
    # star must finish in O(log n)
    path = [(f"p{i:03d}", f"p{i + 1:03d}") for i in range(120)]
    res = connected_components_star(spark, edges_df(spark, path))
    got = {r["id"]: r["component"] for r in res.vertices.collect()}
    assert got == components_oracle(path)
    assert res.converged
    assert res.supersteps <= 12, res.supersteps


def test_personalized_pagerank(spark):
    """PPR vs a dense NumPy oracle: restart + dangling mass return to
    the source set only."""
    pairs = TOY7
    sources = ["a", "f"]
    res = pagerank(
        spark, edges_df(spark, pairs), tol=1e-9, max_iter=300, sources=sources
    )
    got = _ranks(res.vertices)

    ids = sorted({x for e in pairs for x in e})
    idx = {v: i for i, v in enumerate(ids)}
    n, d = len(ids), 0.85
    import numpy as _np

    from collections import defaultdict
    out = defaultdict(set)
    for s, t in pairs:
        out[s].add(t)
    e_s = _np.zeros(n)
    for s in sources:
        e_s[idx[s]] = 1.0 / len(sources)
    r = e_s.copy()
    for _ in range(100_000):
        nxt = _np.zeros(n)
        dm = 0.0
        for v in ids:
            if out[v]:
                for t in out[v]:
                    nxt[idx[t]] += r[idx[v]] / len(out[v])
            else:
                dm += r[idx[v]]
        new = (1 - d) * e_s + d * (nxt + dm * e_s)
        if _np.abs(new - r).max() < 1e-12:
            r = new
            break
        r = new
    for v in ids:
        assert np.isclose(got[v], r[idx[v]], atol=1e-6), (v, got[v], r[idx[v]])
    assert res.converged
    # mass concentrates on/near sources; far component without source
    # mass only via its own source f
    assert got["f"] + got["g"] > 0.3


def test_degree_histogram_bins(spark):
    from pregel_spark.graph import degree_histogram

    # star: hub -> 9 leaves (out_deg 9 -> bin 3), leaves out_deg 0;
    # leaves in_deg 1 -> bin 0, hub in_deg 0 -> bin -1
    e = edges_df(spark, [("hub", f"l{i}") for i in range(9)])
    got = {
        (r.kind, r.bin): r.n_vertices for r in degree_histogram(e).collect()
    }
    assert got == {
        ("out", 3): 1,
        ("out", -1): 9,
        ("in", 0): 9,
        ("in", -1): 1,
    }


def test_spam_mass_dense_oracle(spark):
    """spam_mass = (pr - trustrank)/pr vs a dense 4-step power
    iteration; the trusted seed itself gets mass <= 0, the far
    component (no path from the seed) gets mass ~1."""
    from pregel_spark.graph import spam_mass

    pairs = TOY7
    trusted = ["a"]
    got = {
        r.id: (r.pr, r.tr, r.spam_mass)
        for r in spam_mass(
            spark, edges_df(spark, pairs), trusted, max_iter=4
        ).collect()
    }

    ids = sorted({x for e in pairs for x in e})
    idx = {v: i for i, v in enumerate(ids)}
    n, d = len(ids), 0.85
    from collections import defaultdict

    out = defaultdict(set)
    for s, t in set(pairs):
        out[s].add(t)

    def power(e_vec, k):
        r = e_vec.copy()
        for _ in range(k):
            nxt = np.zeros(n)
            dm = 0.0
            for v in ids:
                if out[v]:
                    for t in out[v]:
                        nxt[idx[t]] += r[idx[v]] / len(out[v])
                else:
                    dm += r[idx[v]]
            r = (1 - d) * e_vec + d * (nxt + dm * e_vec)
        return r

    p = power(np.full(n, 1.0 / n), 4)
    e_s = np.zeros(n)
    e_s[idx["a"]] = 1.0
    t = power(e_s, 4)
    for v in ids:
        pr, tr, sm = got[v]
        assert np.isclose(pr, p[idx[v]], atol=1e-9), v
        assert np.isclose(tr, t[idx[v]], atol=1e-9), v
        assert np.isclose(sm, (p[idx[v]] - t[idx[v]]) / p[idx[v]], atol=1e-9), v
    # trusted seed: trust mass exceeds plain rank -> spam mass <= 0
    assert got["a"][2] <= 0.0
    # f/g cycle is unreachable from 'a' except via restart leakage ->
    # nearly all their rank is untrusted
    assert got["f"][2] > 0.9 and got["g"][2] > 0.9


def test_salsa_matches_dense_walk(spark):
    """SALSA k=4 vs a dense NumPy simulation of the two stochastic
    chains; mass conservation checked exactly."""
    from pregel_spark.graph import salsa

    pairs = [
        ("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h2", "a3"),
        ("h3", "a3"), ("h3", "a4"), ("h4", "a4"),
        # a1 is also a hub for a5 (node on both sides)
        ("a1", "a5"),
    ]
    res = salsa(spark, edges_df(spark, pairs), max_iter=4)
    got = {r.id: (r.authority, r.hub) for r in res.vertices.collect()}

    from collections import defaultdict

    out, inn = defaultdict(set), defaultdict(set)
    for s, t in set(pairs):
        out[s].add(t)
        inn[t].add(s)
    hubs = sorted(out)
    auths = sorted(inn)
    a = {v: 1.0 / len(auths) for v in auths}
    h = {v: 1.0 / len(hubs) for v in hubs}
    for _ in range(4):
        b = {i: sum(a[j] / len(inn[j]) for j in out[i]) for i in hubs}
        a = defaultdict(float)
        for i in hubs:
            for k in out[i]:
                a[k] += b[i] / len(out[i])
        c = defaultdict(float)
        for i in hubs:
            for j in out[i]:
                c[j] += h[i] / len(out[i])
        h = {i: sum(c[j] / len(inn[j]) for j in out[i]) for i in hubs}
    ids = set(hubs) | set(auths)
    assert set(got) == ids
    for v in ids:
        assert np.isclose(got[v][0], a.get(v, 0.0), atol=1e-12), v
        assert np.isclose(got[v][1], h.get(v, 0.0), atol=1e-12), v
    # both chains conserve probability mass exactly
    assert np.isclose(sum(x[0] for x in got.values()), 1.0, atol=1e-9)
    assert np.isclose(sum(x[1] for x in got.values()), 1.0, atol=1e-9)
    assert res.supersteps == 4


def test_spam_mass_collapses_duplicate_arcs(spark):
    """spam_mass on a duplicated edge list must equal spam_mass on the
    distinct list (pagerank's documented multi-edge semantics); the
    owned knobs are rejected."""
    from pregel_spark.graph import spam_mass

    pairs = TOY7
    dup = edges_df(spark, pairs + pairs)  # every arc twice
    ded = edges_df(spark, pairs)
    a = {r.id: r.spam_mass for r in spam_mass(spark, dup, ["a"], max_iter=3).collect()}
    b = {r.id: r.spam_mass for r in spam_mass(
        spark, ded.select("src", "dst").distinct(), ["a"], max_iter=3,
        pre_deduped=True).collect()}
    assert a.keys() == b.keys()
    for v in a:
        assert np.isclose(a[v], b[v], atol=1e-12), v
    import pytest as _pt
    with _pt.raises(ValueError):
        spam_mass(spark, ded, ["a"], sources=["b"])
