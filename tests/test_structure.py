"""Structural statistics: clustering coefficient, reciprocity,
assortativity, Adamic-Adar — hand-computed fixtures."""

from __future__ import annotations

import math

import pytest

from pregel_spark.graph import (
    adamic_adar,
    clustering_coefficient,
    degree_assortativity,
    reciprocity,
)

from conftest import edges_df


def test_clustering_coefficient_triangle_with_pendant(spark):
    # triangle a-b-c plus pendant edge c-d
    e = edges_df(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    got = {r.id: (r.deg, r.triangles, r.lcc) for r in clustering_coefficient(e).collect()}
    assert got["a"] == (2, 1, 1.0)
    assert got["b"] == (2, 1, 1.0)
    assert got["c"][0] == 3 and got["c"][1] == 1
    assert got["c"][2] == pytest.approx(1.0 / 3.0)
    assert got["d"] == (1, 0, 0.0)


def test_reciprocity_counts_simple_arcs_once(spark):
    # arcs: a->b, b->a, a->c, duplicate a->b, self-loop c->c
    e = edges_df(
        spark, [("a", "b"), ("b", "a"), ("a", "c"), ("a", "b"), ("c", "c")]
    )
    row = reciprocity(e).collect()[0]
    assert row.n_edges == 3
    assert row.n_reciprocal == 2
    assert row.reciprocity == pytest.approx(2.0 / 3.0)


def test_assortativity_star_is_minus_one(spark):
    # star: hub degree 3 vs leaves degree 1 -> perfectly disassortative
    e = edges_df(spark, [("h", "l1"), ("h", "l2"), ("h", "l3")])
    row = degree_assortativity(e).collect()[0]
    assert row.n_pairs == 6
    assert row.assortativity == pytest.approx(-1.0)


def test_adamic_adar_four_cycle(spark):
    # 4-cycle a-b-c-d-a: the two diagonals each share 2 neighbors of
    # degree 2; no other pair has >= 2 common neighbors
    e = edges_df(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    got = {(r.u, r.w): (r.n_common, r.aa_score) for r in adamic_adar(e).collect()}
    want_score = 2.0 / math.log(2.0)
    assert set(got) == {("a", "c"), ("b", "d")}
    for n_common, score in got.values():
        assert n_common == 2
        assert score == pytest.approx(want_score)


def test_adamic_adar_center_degree_cutoff(spark):
    # star: leaves share only the hub; excluding the hub as a center
    # removes every candidate pair
    e = edges_df(spark, [("h", f"l{i}") for i in range(4)])
    full = adamic_adar(e, min_common=1, max_center_degree=10).collect()
    assert len(full) == 6  # C(4,2) leaf pairs through the hub
    for r in full:
        assert r.aa_score == pytest.approx(1.0 / math.log(4.0))
    cut = adamic_adar(e, min_common=1, max_center_degree=3).collect()
    assert cut == []


def _brute_colink(pairs, direction, min_common, max_pivot):
    from collections import defaultdict

    e = {(a, b) for a, b in pairs if a != b}
    items = defaultdict(set)  # pivot -> linked items
    for a, b in e:
        if direction == "cocitation":
            items[a].add(b)
        else:
            items[b].add(a)
    out = defaultdict(int)
    for piv, xs in items.items():
        if max_pivot is not None and len(xs) > max_pivot:
            continue
        xs = sorted(xs)
        for i in range(len(xs)):
            for j in range(i + 1, len(xs)):
                out[(xs[i], xs[j])] += 1
    return {p: c for p, c in out.items() if c >= min_common}


def test_cocitation_matches_bruteforce(spark):
    from pregel_spark.graph import co_link_pairs

    pairs = [
        ("p1", "a"), ("p1", "b"), ("p1", "c"),
        ("p2", "a"), ("p2", "b"),
        ("p3", "a"), ("p3", "b"), ("p3", "b"),  # dup arc collapses
        ("p4", "c"), ("p4", "c"),
        ("a", "a"),  # self-loop dropped
    ]
    got = {
        (r.u, r.w): r.n_common
        for r in co_link_pairs(edges_df(spark, pairs), "cocitation").collect()
    }
    assert got == _brute_colink(pairs, "cocitation", 2, 100)
    assert got[("a", "b")] == 3


def test_bibliographic_coupling_matches_bruteforce(spark):
    from pregel_spark.graph import co_link_pairs

    pairs = [
        ("u", "r1"), ("u", "r2"), ("u", "r3"),
        ("w", "r1"), ("w", "r2"),
        ("x", "r2"), ("x", "r3"),
        ("y", "r9"),
    ]
    got = {
        (r.u, r.w): r.n_common
        for r in co_link_pairs(
            edges_df(spark, pairs), "coupling", min_common=1
        ).collect()
    }
    assert got == _brute_colink(pairs, "coupling", 1, 100)
    assert got[("u", "w")] == 2


def test_cocitation_pivot_cutoff_skips_hubs(spark):
    from pregel_spark.graph import co_link_pairs

    # hub cites 5 pages (out-deg 5 > cutoff 4) -> contributes nothing;
    # p cites a,b -> only surviving pair needs min_common=1
    pairs = [("hub", f"t{i}") for i in range(5)] + [("p", "t0"), ("p", "t1")]
    got = {
        (r.u, r.w): r.n_common
        for r in co_link_pairs(
            edges_df(spark, pairs), "cocitation", min_common=1, max_pivot_degree=4
        ).collect()
    }
    assert got == {("t0", "t1"): 1}
    assert got == _brute_colink(pairs, "cocitation", 1, 4)


def test_co_link_rejects_bad_direction(spark):
    from pregel_spark.graph import co_link_pairs

    with pytest.raises(ValueError):
        co_link_pairs(edges_df(spark, [("a", "b")]), "sideways")


def _brute_jaccard(pairs, min_common=2, max_center=100):
    from collections import defaultdict

    nbr = defaultdict(set)
    for a, b in pairs:
        if a != b:
            nbr[a].add(b)
            nbr[b].add(a)
    out = {}
    nodes = sorted(nbr)
    for i, u in enumerate(nodes):
        for w in nodes[i + 1:]:
            if w in nbr[u]:
                continue
            common = [
                v for v in nbr[u] & nbr[w] if len(nbr[v]) <= max_center
            ]
            if len(common) >= min_common:
                out[(u, w)] = (
                    len(common),
                    len(common) / (len(nbr[u]) + len(nbr[w]) - len(common)),
                )
    return out


def test_jaccard_four_cycle_diagonals_are_one(spark):
    from pregel_spark.graph import jaccard_pairs

    e = edges_df(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    got = {(r.u, r.w): (r.n_common, r.jaccard) for r in jaccard_pairs(e).collect()}
    assert got == {("a", "c"): (2, 1.0), ("b", "d"): (2, 1.0)}


def test_jaccard_matches_brute_force_with_cutoff(spark):
    from pregel_spark.graph import jaccard_pairs

    # pseudo-random sparse graph; node n7 becomes a hub over the cutoff
    pairs = [(f"n{(i * 7) % 13}", f"n{(i * 5 + 3) % 13}") for i in range(40)]
    pairs += [("n7", f"m{i}") for i in range(9)]  # push n7's degree up
    e = edges_df(spark, pairs)
    for cutoff in (100, 8):
        got = {
            (r.u, r.w): (r.n_common, r.jaccard)
            for r in jaccard_pairs(e, min_common=1, max_center_degree=cutoff).collect()
        }
        want = _brute_jaccard(pairs, min_common=1, max_center=cutoff)
        assert set(got) == set(want)
        for k, (nc, j) in want.items():
            assert got[k][0] == nc
            assert got[k][1] == pytest.approx(j)


def test_jaccard_denominator_uses_full_degrees(spark):
    from pregel_spark.graph import jaccard_pairs

    # u and w share cheap centers c1, c2; u also links to a hub h whose
    # degree exceeds the cutoff — the hub is excluded from n_common but
    # still counts in deg(u)
    pairs = [("u", "c1"), ("w", "c1"), ("u", "c2"), ("w", "c2"), ("u", "h")]
    pairs += [("h", f"x{i}") for i in range(5)]
    e = edges_df(spark, pairs)
    got = {
        (r.u, r.w): (r.n_common, r.jaccard)
        for r in jaccard_pairs(e, min_common=2, max_center_degree=4).collect()
    }
    # deg(u)=3 (c1,c2,h), deg(w)=2 -> union = 3+2-2 = 3
    assert got[("u", "w")] == (2, pytest.approx(2.0 / 3.0))


def test_modularity_two_cliques(spark):
    from pregel_spark.graph import modularity

    # two 3-cliques joined by one bridge; partition = the two cliques
    e = edges_df(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")],
    )
    labels = spark.createDataFrame(
        [("a", "L"), ("b", "L"), ("c", "L"), ("x", "R"), ("y", "R"), ("z", "R")],
        "id string, label string",
    )
    rows = {r.label: r for r in modularity(e, labels).collect()}
    # m=7; each side: intra=3, deg_sum=7  ->  3/7 - (7/14)^2
    want = 3.0 / 7.0 - 0.25
    for side in ("L", "R"):
        assert rows[side].intra_edges == 3
        assert rows[side].deg_sum == 7
        assert rows[side].contrib == pytest.approx(want)
    assert sum(r.contrib for r in rows.values()) == pytest.approx(2 * want)


def test_modularity_singleton_partition_is_negative(spark):
    from pregel_spark.graph import modularity

    e = edges_df(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    labels = spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("c", "c")], "id string, label string"
    )
    q = sum(r.contrib for r in modularity(e, labels).collect())
    # all-singletons: Q = -sum((d_i/2m)^2) = -3*(2/6)^2
    assert q == pytest.approx(-3 * (2.0 / 6.0) ** 2)


def test_modularity_ignores_duplicate_and_self_edges(spark):
    from pregel_spark.graph import modularity

    e = edges_df(
        spark, [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"), ("b", "c")]
    )
    labels = spark.createDataFrame(
        [("a", "1"), ("b", "1"), ("c", "2")], "id string, label string"
    )
    rows = {r.label: r for r in modularity(e, labels).collect()}
    # simple graph: edges {a-b, b-c}, m=2
    assert rows["1"].intra_edges == 1 and rows["1"].deg_sum == 3
    assert rows["2"].intra_edges == 0 and rows["2"].deg_sum == 1
    assert rows["1"].contrib == pytest.approx(0.5 - (3.0 / 4.0) ** 2)


def test_refine_modularity_pulls_mislabeled_vertex_home(spark):
    from pregel_spark.graph import modularity, refine_modularity

    e = edges_df(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")],
    )
    bad = spark.createDataFrame(
        [("a", "L"), ("b", "L"), ("c", "R"), ("x", "R"), ("y", "R"), ("z", "R")],
        "id string, label string",
    )
    got = {r.id: r.label for r in refine_modularity(e, bad).collect()}
    # c: gain(L) = 2m*k - d*sig' = 28-12 = 16 > gain(stay R) = 14-21 = -7
    assert got["c"] == "L"
    assert got == {"a": "L", "b": "L", "c": "L", "x": "R", "y": "R", "z": "R"}
    q_bad = sum(r.contrib for r in modularity(e, bad).collect())
    q_ref = sum(
        r.contrib
        for r in modularity(
            e, spark.createDataFrame(got.items(), "id string, label string")
        ).collect()
    )
    assert q_ref > q_bad


def test_refine_modularity_is_idempotent_on_optimum(spark):
    from pregel_spark.graph import refine_modularity

    e = edges_df(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")],
    )
    opt = spark.createDataFrame(
        [("a", "L"), ("b", "L"), ("c", "L"), ("x", "R"), ("y", "R"), ("z", "R")],
        "id string, label string",
    )
    got = {r.id: r.label for r in refine_modularity(e, opt).collect()}
    assert got == {r.id: r.label for r in opt.collect()}


def test_refine_modularity_isolated_vertex_keeps_label(spark):
    from pregel_spark.graph import refine_modularity

    e = edges_df(spark, [("a", "b")])
    labels = spark.createDataFrame(
        [("a", "1"), ("b", "1"), ("lonely", "9")], "id string, label string"
    )
    got = {r.id: r.label for r in refine_modularity(e, labels).collect()}
    assert got["lonely"] == "9" and len(got) == 3


def test_butterflies_two_by_two_biclique(spark):
    from pregel_spark.graph import butterflies

    # p1,p2 each cite q1,q2 -> the cited pair (q1,q2) shares 2 pivots
    # -> C(2,2)=1 butterfly in cocitation view
    e = edges_df(spark, [("p1", "q1"), ("p1", "q2"), ("p2", "q1"), ("p2", "q2")])
    row = butterflies(e, "cocitation").collect()[0]
    assert (row.n_pairs, row.n_butterflies) == (1, 1)
    # coupling view is symmetric here: (p1,p2) share q1,q2
    row2 = butterflies(e, "coupling").collect()[0]
    assert (row2.n_pairs, row2.n_butterflies) == (1, 1)


def test_butterflies_empty_when_no_shared_pairs(spark):
    from pregel_spark.graph import butterflies

    e = edges_df(spark, [("a", "x"), ("b", "y")])
    row = butterflies(e).collect()[0]
    assert (row.n_pairs, row.n_butterflies) == (0, 0)


def test_butterflies_random_vs_brute(spark):
    import itertools
    from collections import defaultdict

    import numpy as np

    from pregel_spark.graph import butterflies

    rng = np.random.default_rng(11)
    pairs = sorted(
        {(f"u{a}", f"w{b}") for a, b in rng.integers(0, 12, size=(60, 2))}
    )
    nbrs = defaultdict(set)  # cited -> set of citing pivots? cocitation:
    # pivots are citing (src); pair the cited (dst)
    piv = defaultdict(set)
    for s, d in pairs:
        piv[s].add(d)
    common = defaultdict(int)
    for s, ds in piv.items():
        for u, w in itertools.combinations(sorted(ds), 2):
            common[(u, w)] += 1
    want_bf = sum(c * (c - 1) // 2 for c in common.values() if c >= 2)
    want_pairs = sum(1 for c in common.values() if c >= 2)
    row = butterflies(edges_df(spark, pairs), "cocitation").collect()[0]
    assert (row.n_pairs, row.n_butterflies) == (want_pairs, want_bf)


def test_edge_embeddedness_triangle_with_pendant(spark):
    from pregel_spark.graph import edge_embeddedness

    e = edges_df(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    got = {
        (r.u, r.v): (r.n_common, r.is_local_bridge)
        for r in edge_embeddedness(e).collect()
    }
    assert got == {
        ("a", "b"): (1, False),
        ("a", "c"): (1, False),
        ("b", "c"): (1, False),
        ("c", "d"): (0, True),
    }


def test_edge_embeddedness_random_vs_brute(spark):
    from collections import defaultdict

    import numpy as np

    from pregel_spark.graph import edge_embeddedness

    rng = np.random.default_rng(5)
    pairs = sorted(
        {(f"n{a}", f"n{b}") for a, b in rng.integers(0, 25, size=(90, 2)) if a != b}
    )
    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    want = {}
    for a, b in pairs:
        u, v = min(a, b), max(a, b)
        if (u, v) not in want:
            c = len(nbrs[u] & nbrs[v])
            want[(u, v)] = (c, c == 0)
    got = {
        (r.u, r.v): (r.n_common, r.is_local_bridge)
        for r in edge_embeddedness(edges_df(spark, pairs)).collect()
    }
    assert got == want


def _brute_rich_club(pairs):
    ue = set()
    for a, b in pairs:
        if a != b:
            ue.add((min(a, b), max(a, b)))
    deg = {}
    for a, b in ue:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for k in range(0, max(deg.values())):
        nk = sum(1 for v in deg.values() if v > k)
        if nk < 2:
            continue
        ek = sum(1 for a, b in ue if deg[a] > k and deg[b] > k)
        out[k] = (nk, ek, 2.0 * ek / (nk * (nk - 1)))
    return out


def test_rich_club_clique_plus_pendants(spark):
    from pregel_spark.graph import rich_club

    # triangle hub-clique a-b-c, each with one pendant
    pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("a", "pa"), ("b", "pb"), ("c", "pc"),
    ]
    e = edges_df(spark, pairs)
    got = {r.k: (r.n_k, r.e_k, r.phi) for r in rich_club(e).collect()}
    # k=0: all 6 nodes, all 6 edges; k=1: only the clique remains
    assert got[0] == (6, 6, pytest.approx(2 * 6 / 30))
    assert got[1] == (3, 3, pytest.approx(1.0))
    assert got[2] == (3, 3, pytest.approx(1.0))
    assert max(got) == 2  # thresholds stop below max_deg=3


def test_rich_club_matches_brute_force_on_random_graph(spark):
    import random

    from pregel_spark.graph import rich_club

    rng = random.Random(11)
    pairs = [
        (f"v{rng.randrange(25)}", f"v{rng.randrange(25)}") for _ in range(90)
    ]
    e = edges_df(spark, pairs)
    got = {r.k: (r.n_k, r.e_k, r.phi) for r in rich_club(e).collect()}
    want = _brute_rich_club(pairs)
    assert set(got) == set(want)
    for k, (nk, ek, phi) in want.items():
        assert got[k][0] == nk and got[k][1] == ek, k
        assert got[k][2] == pytest.approx(phi), k
