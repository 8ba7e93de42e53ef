"""SCC + bowtie vs exact Python oracles (Tarjan; set-algebra regions).

The TPC-H-derived link fixtures are all acyclic, so SCC gets its own
hand-designed cyclic graph exercising every bowtie region, plus random
digraphs for the general case.
"""

from __future__ import annotations

import numpy as np

from pregel_spark.graph import bowtie, strongly_connected_components
from tests.conftest import edges_df

# the same shape as __spark_entry__._BOWTIE_PAIRS: giant ring CORE
# 20..39; IN chain 0..9 (with cycle 3-4-5) entering at 22; OUT chain
# 40..48 (with cycle 42-43-44) leaving from 35; tube 7->50->51->45;
# tendrils 6->52->53 (off IN) and 54->55->46 (into OUT); disconnected
# 56->57, 58->59.
BOWTIE_PAIRS = (
    [(i, i + 1) for i in range(20, 39)] + [(39, 20)]
    + [(i, i + 1) for i in range(0, 9)] + [(9, 22), (5, 3)]
    + [(35, 40)] + [(i, i + 1) for i in range(40, 48)] + [(44, 42)]
    + [(7, 50), (50, 51), (51, 45)]
    + [(6, 52), (52, 53), (54, 55), (55, 46)]
    + [(56, 57), (58, 59)]
)


def _g(i):
    return f"g{i:02d}"


def tarjan_scc(pairs):
    """{vertex: min-member-of-its-SCC} — iterative Tarjan."""
    adj = {}
    verts = set()
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        verts.update((a, b))
    index, low, onstk = {}, {}, set()
    stack, out, counter = [], {}, [0]
    for root in sorted(verts):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                onstk.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in onstk:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    onstk.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return out


def test_scc_bowtie_fixture(spark):
    pairs = [(_g(a), _g(b)) for a, b in BOWTIE_PAIRS]
    res = strongly_connected_components(spark, edges_df(spark, pairs))
    got = {r["id"]: r["scc"] for r in res.vertices.collect()}
    assert res.converged
    assert got == tarjan_scc(pairs)
    # spot-check the designed structure
    assert {got[_g(i)] for i in range(20, 40)} == {_g(20)}
    assert {got[_g(i)] for i in (3, 4, 5)} == {_g(3)}
    assert {got[_g(i)] for i in (42, 43, 44)} == {_g(42)}
    assert got[_g(0)] == _g(0) and got[_g(56)] == _g(56)


def test_scc_random_digraphs(spark):
    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        pairs = sorted(
            {
                (f"n{a:02d}", f"n{b:02d}")
                for a, b in zip(rng.integers(0, 40, 120), rng.integers(0, 40, 120))
                if a != b
            }
        )
        res = strongly_connected_components(spark, edges_df(spark, pairs))
        got = {r["id"]: r["scc"] for r in res.vertices.collect()}
        assert res.converged, f"seed {seed} did not converge"
        assert got == tarjan_scc(pairs), f"seed {seed} mismatch"


def test_scc_pure_dag_trims_everything(spark):
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    res = strongly_connected_components(spark, edges_df(spark, pairs))
    got = {r["id"]: r["scc"] for r in res.vertices.collect()}
    assert got == {v: v for v in "abcd"}
    # trim alone settles a DAG: no color/collect supersteps needed
    assert all(m["phase"] == "trim" for m in res.metrics)


def test_scc_single_cycle_no_trim_path(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]
    res = strongly_connected_components(spark, edges_df(spark, pairs), trim=False)
    got = {r["id"]: r["scc"] for r in res.vertices.collect()}
    assert got == {"a": "a", "b": "a", "c": "a"}


def _bowtie_regions_oracle(pairs):
    scc = tarjan_scc(pairs)
    verts = sorted(scc)
    adj, radj = {}, {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        radj.setdefault(b, set()).add(a)

    def reach(seeds, g):
        seen, todo = set(seeds), list(seeds)
        while todo:
            v = todo.pop()
            for w in g.get(v, ()):
                if w not in seen:
                    seen.add(w)
                    todo.append(w)
        return seen

    sizes = {}
    for v, c in scc.items():
        sizes[c] = sizes.get(c, 0) + 1
    giant = min(c for c in sizes if sizes[c] == max(sizes.values()))
    core = {v for v in verts if scc[v] == giant}
    fwd, bwd = reach(core, adj), reach(core, radj)
    out_v, in_v = fwd - core, bwd - core
    known = core | out_v | in_v
    fin = reach(in_v, adj) - known
    bout = reach(out_v, radj) - known
    tubes = fin & bout
    tendrils = (fin | bout) - tubes
    regions = {}
    for v in verts:
        regions[v] = (
            "CORE" if v in core else "IN" if v in in_v else "OUT" if v in out_v
            else "TUBES" if v in tubes else "TENDRILS" if v in tendrils
            else "DISC"
        )
    return regions


def test_bowtie_fixture_regions(spark):
    pairs = [(_g(a), _g(b)) for a, b in BOWTIE_PAIRS]
    res = bowtie(spark, edges_df(spark, pairs))
    got = {r["id"]: r["region"] for r in res.vertices.collect()}
    assert got == _bowtie_regions_oracle(pairs)
    # the designed regions, explicitly
    assert {v for v, r in got.items() if r == "CORE"} == {_g(i) for i in range(20, 40)}
    assert {v for v, r in got.items() if r == "IN"} == {_g(i) for i in range(0, 10)}
    assert {v for v, r in got.items() if r == "OUT"} == {_g(i) for i in range(40, 49)}
    assert {v for v, r in got.items() if r == "TUBES"} == {_g(50), _g(51)}
    assert {v for v, r in got.items() if r == "TENDRILS"} == {
        _g(52), _g(53), _g(54), _g(55)
    }
    assert {v for v, r in got.items() if r == "DISC"} == {
        _g(56), _g(57), _g(58), _g(59)
    }


def test_bowtie_random_digraph(spark):
    rng = np.random.default_rng(7)
    pairs = sorted(
        {
            (f"n{a:02d}", f"n{b:02d}")
            for a, b in zip(rng.integers(0, 30, 90), rng.integers(0, 30, 90))
            if a != b
        }
    )
    res = bowtie(spark, edges_df(spark, pairs))
    got = {r["id"]: r["region"] for r in res.vertices.collect()}
    assert got == _bowtie_regions_oracle(pairs)


def test_scc_resume_identical(spark, tmp_path):
    from pregel_spark.tableio import CheckpointManager

    pairs = [(_g(a), _g(b)) for a, b in BOWTIE_PAIRS]
    e = edges_df(spark, pairs)
    ck = str(tmp_path / "ck")
    # run 1: "killed" after 1 outer round
    part = strongly_connected_components(
        spark, e, max_rounds=1, checkpoint_dir=ck, run_id="r1"
    )
    assert not part.converged
    assert CheckpointManager(ck, "r1").completed_supersteps() == [1]
    # run 2: resumes at round 2, finishes, matches Tarjan
    res = strongly_connected_components(
        spark, e, checkpoint_dir=ck, run_id="r1", resume=True
    )
    assert res.converged
    got = {r["id"]: r["scc"] for r in res.vertices.collect()}
    assert got == tarjan_scc(pairs)


def test_scc_truncation_flagged_not_mislabeled(spark):
    # a 12-cycle is one SCC; with max_iter=3 the min-color loop cannot
    # reach its fixpoint. The engine must NOT emit split labels — it
    # aborts the round: converged False, the cycle absent from output.
    pairs = [(f"c{i}", f"c{(i + 1) % 12}") for i in range(12)]
    res = strongly_connected_components(
        spark, edges_df(spark, pairs), max_iter=3
    )
    assert res.converged is False
    labels = {r["id"]: r["scc"] for r in res.vertices.collect()}
    # nothing wrongly assigned: any vertex present must carry the true
    # (min-member) label of the full cycle
    for v, s in labels.items():
        assert s == "c0", (v, s)
    # with ample max_iter the same graph resolves exactly
    res2 = strongly_connected_components(spark, edges_df(spark, pairs))
    assert res2.converged is True
    assert {r["scc"] for r in res2.vertices.collect()} == {"c0"}


def test_bowtie_truncation_flagged(spark):
    # core 2-cycle with an OUT chain deeper than max_iter: the forward
    # closure is truncated, so converged must be False
    pairs = [("a", "b"), ("b", "a")] + [
        (f"o{i}" if i else "a", f"o{i + 1}") for i in range(0, 8)
    ]
    res = bowtie(spark, edges_df(spark, pairs), max_iter=2)
    assert res.converged is False
    res2 = bowtie(spark, edges_df(spark, pairs))
    assert res2.converged is True


def test_condense_bowtie_matches_python_oracle(spark):
    from pregel_spark.graph import condense

    pairs = [(_g(a), _g(b)) for a, b in BOWTIE_PAIRS]
    got = {
        (r.src, r.dst)
        for r in condense(spark, edges_df(spark, pairs)).collect()
    }
    lab = tarjan_scc(pairs)
    want = {
        (lab[a], lab[b]) for a, b in pairs if lab[a] != lab[b]
    }
    assert got == want
    # acyclicity: a condensation can never contain a 2-cycle
    assert not any((b, a) in got for a, b in got)


def test_condense_accepts_precomputed_labels(spark):
    from pregel_spark.graph import condense, strongly_connected_components

    pairs = [(_g(a), _g(b)) for a, b in BOWTIE_PAIRS]
    e = edges_df(spark, pairs)
    res = strongly_connected_components(spark, e)
    a = {tuple(r) for r in condense(spark, e, labels=res.vertices).collect()}
    b = {tuple(r) for r in condense(spark, e).collect()}
    assert a == b


def _kahn_levels(pairs):
    """{v: longest path from a source}; None-keyed set of unleveled."""
    verts = {v for p in pairs for v in p}
    preds = {}
    for a, b in pairs:
        preds.setdefault(b, set()).add(a)
    levels, changed = {}, True
    rounds = 0
    rem = set(verts)
    while rem and rounds <= len(verts):
        zero = {v for v in rem if not (preds.get(v, set()) & rem)}
        if not zero:
            break
        for v in zero:
            levels[v] = rounds
        rem -= zero
        rounds += 1
    return levels, rem


def test_topo_levels_diamond_and_chain(spark):
    from pregel_spark.graph import topo_levels

    pairs = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
             ("d", "e"), ("x", "c")]
    res = topo_levels(spark, edges_df(spark, pairs))
    got = {r.id: r.level for r in res.vertices.collect()}
    want, rem = _kahn_levels(pairs)
    assert res.converged and not rem
    assert got == want
    assert got == {"a": 0, "x": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_topo_levels_cycle_is_flagged_not_mislabeled(spark):
    from pregel_spark.graph import topo_levels

    # a -> b -> (c <-> d) -> e : the cycle and its downstream must be
    # ABSENT, never given a fabricated level
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "c"), ("d", "e")]
    res = topo_levels(spark, edges_df(spark, pairs))
    got = {r.id: r.level for r in res.vertices.collect()}
    assert not res.converged
    assert res.aggregates["n_unleveled"] == 3
    assert got == {"a": 0, "b": 1}


def test_topo_levels_of_bowtie_condensation(spark):
    from pregel_spark.graph import condense, topo_levels

    pairs = [(_g(a), _g(b)) for a, b in BOWTIE_PAIRS]
    e = edges_df(spark, pairs)
    dag = condense(spark, e)
    res = topo_levels(spark, dag, pre_deduped=True)
    assert res.converged
    lab = tarjan_scc(pairs)
    cpairs = sorted({(lab[a], lab[b]) for a, b in pairs if lab[a] != lab[b]})
    want, rem = _kahn_levels(cpairs)
    assert not rem
    assert {r.id: r.level for r in res.vertices.collect()} == want
