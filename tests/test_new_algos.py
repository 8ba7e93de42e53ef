"""HITS / SSSP / k-core / contract_graph vs naive oracles."""

from __future__ import annotations

import heapq
from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from pregel_spark.graph import contract_graph, hits, k_core, shortest_paths

from tests.conftest import edges_df
from tests.graphs import CLIQUE_BRIDGE, TOY7

# --------------------------- oracles ---------------------------------


def hits_oracle(pairs, k):
    """a <- A^T h / ||.||, h <- A A^T h / ||.|| from h0 = 1."""
    nodes = sorted({x for e in pairs for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, t in set(pairs):
        A[idx[s], idx[t]] = 1.0
    h = np.ones(len(nodes))
    a = np.ones(len(nodes))
    for _ in range(k):
        ar = A.T @ h
        hr = A @ ar
        na, nh = np.linalg.norm(ar), np.linalg.norm(hr)
        a = ar / na if na > 0 else np.zeros_like(ar)
        h = hr / nh if nh > 0 else np.zeros_like(hr)
    return {v: (a[idx[v]], h[idx[v]]) for v in nodes}


def dijkstra_oracle(wpairs, sources):
    """{id: dist} over reachable vertices; wpairs = [(s, t, w), ...]."""
    adj = defaultdict(list)
    nodes = set(sources)
    for s, t, w in wpairs:
        adj[s].append((t, w))
        nodes.add(s)
        nodes.add(t)
    dist = {s: 0.0 for s in sources}
    pq = [(0.0, s) for s in sources]
    heapq.heapify(pq)
    while pq:
        d, v = heapq.heappop(pq)
        if d > dist.get(v, float("inf")):
            continue
        for t, w in adj[v]:
            nd = d + w
            if nd < dist.get(t, float("inf")):
                dist[t] = nd
                heapq.heappush(pq, (nd, t))
    return dist


def kcore_oracle(pairs, k, max_rounds=None):
    """Peel; returns the surviving vertex set."""
    nbrs = defaultdict(set)
    for a, b in pairs:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    alive = set(nbrs)
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        rounds += 1
        keep = {v for v in alive if len(nbrs[v] & alive) >= k}
        if keep == alive:
            break
        alive = keep
        if not alive:
            break
    return alive


# --------------------------- HITS -------------------------------------


def test_hits_vs_numpy_toy(spark):
    res = hits(spark, edges_df(spark, TOY7), max_iter=6)
    got = {r["id"]: (r["auth"], r["hub"]) for r in res.vertices.collect()}
    want = hits_oracle(TOY7, 6)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-9)
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-9)
    assert res.supersteps == 6


def test_hits_single_edge_and_convergence(spark):
    # a -> b: b is the only authority, a the only hub, norm 1 each
    res = hits(spark, edges_df(spark, [("a", "b")]), max_iter=3, tol=1e-12)
    got = {r["id"]: (r["auth"], r["hub"]) for r in res.vertices.collect()}
    assert got["b"][0] == pytest.approx(1.0)
    assert got["a"][1] == pytest.approx(1.0)
    assert got["a"][0] == 0.0 and got["b"][1] == 0.0
    assert res.converged  # fixpoint after the first superstep


def test_hits_random_digraph(spark):
    rng = np.random.default_rng(7)
    pairs = sorted(
        {
            (f"n{a}", f"n{b}")
            for a, b in rng.integers(0, 40, size=(300, 2))
            if a != b
        }
    )
    res = hits(spark, edges_df(spark, pairs), max_iter=4)
    got = {r["id"]: (r["auth"], r["hub"]) for r in res.vertices.collect()}
    want = hits_oracle(pairs, 4)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-9)
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-9)


# --------------------------- SSSP --------------------------------------


def wedges_df(spark, wpairs):
    return spark.createDataFrame(
        [(s, t, float(w)) for s, t, w in wpairs],
        "src string, dst string, weight double",
    )


def test_sssp_vs_dijkstra_random(spark):
    rng = np.random.default_rng(11)
    wpairs = sorted(
        {
            (f"n{a}", f"n{b}", int(w))
            for a, b, w in zip(
                rng.integers(0, 60, 400),
                rng.integers(0, 60, 400),
                rng.integers(1, 9, 400),
            )
            if a != b
        }
    )
    res = shortest_paths(spark, wedges_df(spark, wpairs), sources=["n0", "n7"])
    got = {r["id"]: r["dist"] for r in res.vertices.collect()}
    want = dijkstra_oracle(wpairs, ["n0", "n7"])
    assert res.converged
    reached = {v: d for v, d in got.items() if d is not None}
    assert reached == pytest.approx(want)
    # unreachable vertices are present with NULL
    assert set(got) >= set(want)


def test_sssp_parallel_edges_take_min(spark):
    wpairs = [("a", "b", 5.0), ("a", "b", 2.0), ("b", "c", 1.0)]
    res = shortest_paths(spark, wedges_df(spark, wpairs), sources=["a"])
    got = {r["id"]: r["dist"] for r in res.vertices.collect()}
    assert got == {"a": 0.0, "b": 2.0, "c": 3.0}


def test_sssp_undirected_and_foreign_source(spark):
    wpairs = [("a", "b", 1.0), ("c", "b", 1.0)]
    res = shortest_paths(
        spark, wedges_df(spark, wpairs), sources=["c", "zz"], directed=False
    )
    got = {r["id"]: r["dist"] for r in res.vertices.collect()}
    # undirected: c->b->a reachable; zz is reported as its own island
    assert got == {"a": 2.0, "b": 1.0, "c": 0.0, "zz": 0.0}


def test_sssp_rejects_negative_weights(spark):
    with pytest.raises(ValueError):
        shortest_paths(spark, wedges_df(spark, [("a", "b", -1.0)]), sources=["a"])


def test_sssp_fixed_rounds_prefix(spark):
    # chain 0->1->2->...->9; after 3 rounds only dist<=3 is final
    wpairs = [(f"c{i}", f"c{i+1}", 1.0) for i in range(9)]
    res = shortest_paths(spark, wedges_df(spark, wpairs), sources=["c0"], max_iter=3)
    got = {r["id"]: r["dist"] for r in res.vertices.collect() if r["dist"] is not None}
    assert got == {"c0": 0.0, "c1": 1.0, "c2": 2.0, "c3": 3.0}
    assert not res.converged


# --------------------------- k-core ------------------------------------


def test_kcore_clique_bridge(spark):
    e = edges_df(spark, CLIQUE_BRIDGE)
    # k=4: only the K5 survives (bridge vertex v0 has in-K5 degree 4)
    got4 = {r["id"] for r in k_core(spark, e, k=4).vertices.collect()}
    assert got4 == kcore_oracle(CLIQUE_BRIDGE, 4) == {f"v{i}" for i in range(5)}
    # k=3: both cliques survive, k=6: nothing
    got3 = {r["id"] for r in k_core(spark, e, k=3).vertices.collect()}
    assert got3 == kcore_oracle(CLIQUE_BRIDGE, 3)
    res6 = k_core(spark, e, k=6)
    assert res6.vertices.count() == 0 and res6.converged


def test_kcore_bounded_rounds_match_oracle(spark):
    # path graph peels one layer per round at k=2 -> bounded != converged
    pairs = [(f"p{i}", f"p{i+1}") for i in range(10)]
    e = edges_df(spark, pairs)
    got = {r["id"] for r in k_core(spark, e, k=2, max_rounds=2).vertices.collect()}
    assert got == kcore_oracle(pairs, 2, max_rounds=2)
    full = {r["id"] for r in k_core(spark, e, k=2).vertices.collect()}
    assert full == kcore_oracle(pairs, 2) == set()


def test_kcore_random_vs_oracle(spark):
    rng = np.random.default_rng(3)
    pairs = sorted(
        {
            (f"n{a}", f"n{b}")
            for a, b in rng.integers(0, 50, size=(200, 2))
            if a != b
        }
    )
    for k in (2, 3):
        got = {
            r["id"] for r in k_core(spark, edges_df(spark, pairs), k=k).vertices.collect()
        }
        assert got == kcore_oracle(pairs, k)


def test_kcore_rejects_k0(spark):
    with pytest.raises(ValueError):
        k_core(spark, edges_df(spark, TOY7), k=0)


# --------------------------- contract_graph ----------------------------


def test_contract_graph_expr_and_mapping_agree(spark):
    e = edges_df(spark, TOY7)  # ids are single letters
    grp = lambda c: F.when(c.isin("a", "b", "c"), "g1").otherwise("g2")  # noqa: E731
    by_expr = contract_graph(e, group_fn=grp)
    ids = sorted({x for p in TOY7 for x in p})
    mapping = spark.createDataFrame(
        [(v, "g1" if v in ("a", "b", "c") else "g2") for v in ids],
        "id string, group string",
    )
    by_map = contract_graph(e, mapping=mapping)
    rows_e = {(r["src"], r["dst"]): (r["weight"], r["n_edges"]) for r in by_expr.collect()}
    rows_m = {(r["src"], r["dst"]): (r["weight"], r["n_edges"]) for r in by_map.collect()}
    assert rows_e == rows_m
    # hand-check: g1 internal = ab, bc, ca -> 3 edges; g1->g2 = cd, ad
    assert rows_e[("g1", "g1")] == (3.0, 3)
    assert rows_e[("g1", "g2")] == (2.0, 2)


def test_contract_graph_drop_loops_and_arg_check(spark):
    e = edges_df(spark, TOY7)
    grp = lambda c: F.lit("all")  # noqa: E731
    assert contract_graph(e, group_fn=grp, drop_loops=True).count() == 0
    with pytest.raises(ValueError):
        contract_graph(e)
    with pytest.raises(ValueError):
        contract_graph(e, group_fn=grp, mapping=e.select(F.col("src").alias("id")))


# --------------------------- checkpoint resume -------------------------


def test_hits_checkpoint_resume_matches_straight_run(spark, tmp_path):
    e = edges_df(spark, TOY7)
    straight = hits(spark, e, max_iter=4)
    ck = str(tmp_path / "hits_ck")
    hits(spark, e, max_iter=2, checkpoint_dir=ck, checkpoint_interval=1, run_id="r1")
    resumed = hits(
        spark, e, max_iter=4, checkpoint_dir=ck, run_id="r1", resume=True
    )
    a = {r["id"]: (r["auth"], r["hub"]) for r in straight.vertices.collect()}
    b = {r["id"]: (r["auth"], r["hub"]) for r in resumed.vertices.collect()}
    assert resumed.supersteps == 4
    for v in a:
        assert b[v][0] == pytest.approx(a[v][0], abs=1e-12)
        assert b[v][1] == pytest.approx(a[v][1], abs=1e-12)


def test_sssp_checkpoint_resume_matches_straight_run(spark, tmp_path):
    wpairs = [(f"c{i}", f"c{i+1}", (i % 3) + 1.0) for i in range(12)]
    e = wedges_df(spark, wpairs)
    straight = shortest_paths(spark, e, sources=["c0"])
    ck = str(tmp_path / "sssp_ck")
    shortest_paths(
        spark, e, sources=["c0"], max_iter=3,
        checkpoint_dir=ck, checkpoint_interval=1, run_id="r1",
    )
    resumed = shortest_paths(
        spark, e, sources=["c0"], checkpoint_dir=ck, run_id="r1", resume=True
    )
    a = {r["id"]: r["dist"] for r in straight.vertices.collect()}
    b = {r["id"]: r["dist"] for r in resumed.vertices.collect()}
    assert a == b
    assert resumed.converged and resumed.supersteps == straight.supersteps
    # per-partition I5 rows ride checkpointed runs
    assert resumed.partition_metrics


def test_kcore_checkpoint_resume_matches_straight_run(spark, tmp_path):
    pairs = [(f"p{i}", f"p{i+1}") for i in range(8)] + [
        ("q0", "q1"), ("q1", "q2"), ("q2", "q0")
    ]
    e = edges_df(spark, pairs)
    straight = {r["id"] for r in k_core(spark, e, k=2).vertices.collect()}
    ck = str(tmp_path / "kcore_ck")
    k_core(spark, e, k=2, max_rounds=2,
           checkpoint_dir=ck, checkpoint_interval=1, run_id="r1")
    resumed = k_core(spark, e, k=2, checkpoint_dir=ck, run_id="r1", resume=True)
    got = {r["id"] for r in resumed.vertices.collect()}
    assert got == straight == {"q0", "q1", "q2"}
    assert resumed.converged


# --------------------------- random walks ------------------------------


def walks_oracle(pairs, walk_length, walks_per_vertex, seed):
    """Pure-Python mirror of graph/walks.py's deterministic picks."""
    import hashlib

    adj = defaultdict(set)
    nodes = set()
    for a, b in pairs:
        adj[a].add(b)
        nodes.add(a)
        nodes.add(b)
    rows = set()
    for start in nodes:
        for w in range(walks_per_vertex):
            cur = start
            rows.add((start, w, 0, cur))
            for t in range(1, walk_length + 1):
                nbrs = sorted(adj[cur])
                if not nbrs:
                    break
                h = int(
                    hashlib.md5(
                        f"{seed}:{start}:{w}:{t}:{cur}".encode()
                    ).hexdigest()[:15],
                    16,
                )
                cur = nbrs[h % len(nbrs)]
                rows.add((start, w, t, cur))
    return rows


def test_random_walks_vs_python_oracle(spark):
    from pregel_spark.graph import random_walks

    res = random_walks(
        spark, edges_df(spark, TOY7), walk_length=3, walks_per_vertex=2, seed=7
    )
    got = {(r["start"], r["walk"], r["step"], r["id"]) for r in res.collect()}
    assert got == walks_oracle(TOY7, 3, 2, 7)
    # walks from f/g bounce in the 2-cycle forever; walks hitting a
    # dangling-free graph all reach full length here except none dangle
    # in TOY7 -> every walk has exactly 4 rows
    assert len(got) >= len({x for p in TOY7 for x in p}) * 2


def test_random_walks_end_at_dangling(spark):
    from pregel_spark.graph import random_walks

    res = random_walks(
        spark, edges_df(spark, [("a", "b")]), walk_length=5, walks_per_vertex=1
    )
    rows = {(r["start"], r["step"], r["id"]) for r in res.collect()}
    # a's walk: a -> b then stops (b dangles); b's walk: just b
    assert rows == {("a", 0, "a"), ("a", 1, "b"), ("b", 0, "b")}


def test_random_walks_deterministic_and_seed_sensitive(spark):
    from pregel_spark.graph import random_walks

    e = edges_df(spark, CLIQUE_BRIDGE + [(b, a) for a, b in CLIQUE_BRIDGE])
    r1 = {tuple(r) for r in random_walks(spark, e, 4, 1, seed=1).collect()}
    r2 = {tuple(r) for r in random_walks(spark, e, 4, 1, seed=1).collect()}
    r3 = {tuple(r) for r in random_walks(spark, e, 4, 1, seed=2).collect()}
    assert r1 == r2
    assert r1 != r3


# --------------------- bucketed (indexed) SSSP scale path ---------------


def test_sssp_indexed_matches_inline_and_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    from pregel_spark.graph.sssp import (
        shortest_paths_indexed,
        write_edge_buckets,
    )

    rng = np.random.default_rng(5)
    wpairs = sorted(
        {
            (f"n{a}", f"n{b}", int(w))
            for a, b, w in zip(
                rng.integers(0, 50, 300),
                rng.integers(0, 50, 300),
                rng.integers(1, 6, 300),
            )
            if a != b
        }
    )
    e = wedges_df(spark, wpairs)
    path = str(tmp_path / "sssp_idx")
    write_edge_buckets(e, path, buckets=16)
    inline = shortest_paths(spark, e, sources=["n0"])
    indexed = shortest_paths_indexed(spark, path, sources=["n0"])
    a = {r["id"]: r["dist"] for r in inline.vertices.collect()}
    b = {r["id"]: r["dist"] for r in indexed.vertices.collect()}
    assert a == b
    assert indexed.converged and indexed.supersteps == inline.supersteps
    # metrics record how many bucket dirs each superstep scanned
    assert all(m["buckets_scanned"] <= 16 for m in indexed.metrics)

    # the pruned scan must touch ONLY the frontier's bucket dirs: for a
    # single-source step the filter keeps exactly one bucket. The index
    # stores dense vids (write_edge_buckets), so the bucket hash is
    # over n0's vid, via the index's own vmap sidecar.
    vid0 = (
        spark.read.parquet(f"{path}/vmap")
        .filter(F.col("id") == "n0")
        .collect()[0]["vid"]
    )
    blist = [
        r["b"]
        for r in spark.createDataFrame([(vid0,)], "src long")
        .select(F.pmod(F.xxhash64("src"), F.lit(16)).alias("b"))
        .collect()
    ]
    pruned = spark.read.parquet(f"{path}/edges").filter(
        F.col("bucket").isin(blist)
    )
    # files ACTUALLY read (input_file_name observes pruning; a plain
    # .inputFiles() reports the unpruned relation)
    files = {
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert files, "pruned scan lost all files"
    assert all(f"bucket={blist[0]}/" in f for f in files), files
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters"
    )[1][:120]


def test_lpa_rejects_unknown_mode(spark):
    import pytest
    from pregel_spark.graph import label_propagation
    from tests.conftest import edges_df as _edf

    with pytest.raises(ValueError, match="unknown mode"):
        label_propagation(
            spark, _edf(spark, [("a", "b")]), max_iter=1, mode="fronteir"
        )


# --------------------------- coreness ----------------------------------


def _sym_nbrs(pairs):
    nbrs = defaultdict(set)
    for a, b in pairs:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    return nbrs


def _hindex(vals):
    h = 0
    for i, x in enumerate(sorted(vals, reverse=True), 1):
        if x >= i:
            h = i
        else:
            break
    return h


def coreness_oracle(pairs, max_rounds=None):
    """H-index fixpoint (Lu et al. 2016) — converges to core numbers."""
    nbrs = _sym_nbrs(pairs)
    c = {v: len(nbrs[v]) for v in nbrs}
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        rounds += 1
        nxt = {v: _hindex([c[u] for u in nbrs[v]]) for v in nbrs}
        if nxt == c:
            break
        c = nxt
    return c


def test_coreness_clique_bridge(spark):
    from pregel_spark.graph import coreness

    res = coreness(spark, edges_df(spark, CLIQUE_BRIDGE))
    got = {r["id"]: r["coreness"] for r in res.vertices.collect()}
    want = coreness_oracle(CLIQUE_BRIDGE)
    assert got == want
    assert res.converged
    # K5 members have core number 4
    assert all(got[f"v{i}"] == 4 for i in range(5))


def test_coreness_random_matches_both_oracles(spark):
    from pregel_spark.graph import coreness

    rng = np.random.default_rng(7)
    pairs = sorted(
        {(f"n{a}", f"n{b}") for a, b in rng.integers(0, 60, size=(260, 2)) if a != b}
    )
    got = {
        r["id"]: r["coreness"]
        for r in coreness(spark, edges_df(spark, pairs)).vertices.collect()
    }
    want = coreness_oracle(pairs)
    assert got == want
    # cross-check the H-index fixpoint against the independent peel
    peel = _peel_coreness(pairs)
    assert want == peel


def _peel_coreness(pairs):
    """Textbook O(V+E) bucket peel (Batagelj-Zaversnik)."""
    nbrs = _sym_nbrs(pairs)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    core = {}
    order = sorted(deg, key=lambda v: (deg[v], v))
    cur = dict(deg)
    import heapq as _hq

    h = [(d, v) for v, d in deg.items()]
    _hq.heapify(h)
    seen = set()
    k = 0
    while h:
        d, v = _hq.heappop(h)
        if v in seen or d > cur[v]:
            continue
        seen.add(v)
        k = max(k, cur[v])
        core[v] = k
        for u in nbrs[v]:
            if u not in seen:
                cur[u] -= 1
                _hq.heappush(h, (cur[u], u))
    return core


def test_coreness_bounded_rounds_match_hindex_iteration(spark):
    from pregel_spark.graph import coreness

    # long path: degrees 1/2 -> H-index needs several rounds to settle
    pairs = [(f"p{i}", f"p{i+1}") for i in range(12)]
    res = coreness(spark, edges_df(spark, pairs), max_rounds=2)
    got = {r["id"]: r["coreness"] for r in res.vertices.collect()}
    assert got == coreness_oracle(pairs, max_rounds=2)


def test_pseudo_diameter_path_graph_exact(spark):
    # path a-b-c-d-e: double sweep is exact on trees -> diameter 4
    from pregel_spark.graph import pseudo_diameter

    e = edges_df(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    row = pseudo_diameter(spark, e).collect()[0]
    assert row.start_id == "a"
    assert row.start_ecc == 4 and row.far_id == "e"
    assert row.far_ecc == 4 and row.diameter_lb == 4


def test_pseudo_diameter_cycle_and_disconnected(spark):
    # 6-cycle (diameter 3) plus a far-away disconnected pair: the
    # second component never contaminates the eccentricities
    from pregel_spark.graph import pseudo_diameter

    cyc = [("c0", "c1"), ("c1", "c2"), ("c2", "c3"),
           ("c3", "c4"), ("c4", "c5"), ("c5", "c0")]
    e = edges_df(spark, cyc + [("z1", "z2")])
    row = pseudo_diameter(spark, e).collect()[0]
    assert row.start_id == "c0"
    assert row.start_ecc == 3
    # argmax tie-break: min id among the dist-3 vertices of c0 -> c3
    assert row.far_id == "c3"
    assert row.far_ecc == 3 and row.diameter_lb == 3


def test_sssp_resume_rejects_id_mode_mismatch(spark, tmp_path):
    """A checkpoint written under one id representation must not be
    silently joined against the other (string vs long keys cast-coerce
    to NULL = every vertex unreachable). The id mode is stamped into
    the checkpoint meta on save and validated on resume."""
    import json
    import os

    wpairs = [(f"c{i}", f"c{i+1}", 1.0) for i in range(12)]
    e = wedges_df(spark, wpairs)
    ck = str(tmp_path / "sssp_ck_mode")
    shortest_paths(
        spark, e, sources=["c0"], max_iter=3,
        checkpoint_dir=ck, checkpoint_interval=1, run_id="r1",
    )
    # tamper the stamp to simulate a checkpoint from a numeric-id run
    run_dir = os.path.join(ck, "r1")
    steps = sorted(
        d for d in os.listdir(run_dir) if d.startswith("superstep=")
    )
    man_path = os.path.join(run_dir, steps[-1], "_manifest.json")
    with open(man_path) as f:
        man = json.load(f)
    assert man["meta"]["id_mode"] == "string"
    man["meta"]["id_mode"] = "numeric"
    with open(man_path, "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError, match="id_mode"):
        shortest_paths(
            spark, e, sources=["c0"], checkpoint_dir=ck, run_id="r1",
            resume=True,
        )
