"""Multi-level Louvain: pure-Python replay parity (FIXTURES.md §6
style), unweighted equivalence with refine_modularity, and community
recovery on the two-block fixture."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from conftest import edges_df
from graphs import two_components

from pregel_spark.graph import refine_modularity
from pregel_spark.graph.louvain import (
    _weighted_simple,
    local_move_round,
    louvain,
    modularity_weighted,
)

from pyspark.sql import functions as F


# weighted multigraph with parallel arcs, a reverse duplicate, and a
# self-loop — every input wrinkle _weighted_simple must fold
WEIGHTED_FIXTURE = [
    ("a", "b", 3), ("b", "a", 1),      # W_ab = 4
    ("b", "c", 2), ("c", "d", 5),
    ("d", "a", 1), ("c", "c", 2),      # self-loop: c_c = 2
    ("e", "f", 7), ("f", "g", 7), ("g", "e", 7),
    ("a", "e", 1),
]


def py_hash60(x):
    return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)


def replay_louvain(arcs, levels=2, rounds=2):
    """Exact Python replay of louvain()'s fixed schedule (including
    the hash-parity alternation that breaks move oscillation)."""
    W = defaultdict(int)
    C = defaultdict(int)
    verts = set()
    for s, d, w in arcs:
        verts.update((s, d))
        if s == d:
            C[s] += w
        else:
            W[(min(s, d), max(s, d))] += w

    assign = {v: v for v in verts}
    for level in range(levels):
        sverts = sorted(set(C) | {x for p in W for x in p})
        lab = {v: v for v in sverts}
        for rnd in range(rounds):
            deg = defaultdict(int)
            for (u, v), w in W.items():
                deg[u] += w
                deg[v] += w
            for v, c in C.items():
                deg[v] += 2 * c
            m = sum(W.values()) + sum(C.values())
            sig = defaultdict(int)
            for v in sverts:
                sig[lab[v]] += deg[v]
            k = defaultdict(int)
            for (u, v), w in W.items():
                k[(u, lab[v])] += w
                k[(v, lab[u])] += w
            new = {}
            for v in sverts:
                cands = {lab[v]: k.get((v, lab[v]), 0)}
                for (x, b), kv in k.items():
                    if x == v:
                        cands[b] = kv
                best = None
                for b, kv in cands.items():
                    sigx = sig[b] - (deg[v] if b == lab[v] else 0)
                    s = 2 * m * kv - deg[v] * sigx
                    key = (-s, 0 if b == lab[v] else 1, b)
                    if best is None or key < best:
                        best = key
                new[v] = best[2] if py_hash60(v) % 2 == rnd % 2 else lab[v]
            lab = new
        assign = {v: lab[assign[v]] for v in assign}
        if all(v == g for v, g in lab.items()) or level == levels - 1:
            break
        W2, C2 = defaultdict(int), defaultdict(int)
        for (u, v), w in W.items():
            gu, gv = lab[u], lab[v]
            if gu == gv:
                C2[gu] += w
            else:
                W2[(min(gu, gv), max(gu, gv))] += w
        for v, c in C.items():
            C2[lab[v]] += c
        W, C = W2, C2
    return assign


def wedges_df(spark, arcs):
    return spark.createDataFrame(
        [(s, d, float(w)) for s, d, w in arcs],
        "src string, dst string, weight double",
    )


def test_louvain_replay_parity(spark):
    got = {
        r["id"]: r["label"]
        for r in louvain(
            spark, wedges_df(spark, WEIGHTED_FIXTURE), levels=2, rounds=2,
            weight_col="weight",
        ).collect()
    }
    want = replay_louvain(WEIGHTED_FIXTURE, levels=2, rounds=2)
    assert got == want
    # parity-gated moves stick: the heavy triangle ends up together
    assert len({got["e"], got["f"], got["g"]}) == 1


def test_louvain_replay_parity_three_levels(spark):
    got = {
        r["id"]: r["label"]
        for r in louvain(
            spark, wedges_df(spark, WEIGHTED_FIXTURE), levels=3, rounds=1,
            weight_col="weight",
        ).collect()
    }
    assert got == replay_louvain(WEIGHTED_FIXTURE, levels=3, rounds=1)


def test_local_move_matches_refine_modularity_unweighted(spark):
    # on a loop-free simple graph with unit weights, one weighted
    # local-move round IS refine_modularity (same integer argmax)
    pairs = two_components(seed=7, n=12, p=0.3)
    edges = edges_df(spark, pairs)
    labels = edges.select(F.col("src").alias("id")).unionByName(
        edges.select(F.col("dst").alias("id"))
    ).distinct().select("id", F.col("id").alias("label"))
    sym, loops = _weighted_simple(edges, None)
    got = {
        r["id"]: r["label"]
        for r in local_move_round(sym, loops, labels).collect()
    }
    want = {
        r["id"]: r["label"]
        for r in refine_modularity(edges, labels).collect()
    }
    assert got == want


def test_louvain_recovers_blocks(spark):
    pairs = two_components(seed=42, n=25, p=0.2)
    res = louvain(spark, edges_df(spark, pairs), levels=3, rounds=2)
    rows = res.collect()
    # labels never span the two disconnected blocks
    for r in rows:
        assert r["id"][0] == r["label"][0]
    # and the partition has real community structure
    sym, loops = _weighted_simple(edges_df(spark, pairs), None)
    q = sum(
        r["contrib"]
        for r in modularity_weighted(sym, loops, res.select("id", "label")).collect()
    )
    assert q > 0.2, q
