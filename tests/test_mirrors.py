"""Mirror / link-farm detection: hand-built fixture + exact values."""

from __future__ import annotations

from pregel_spark.graph import exact_mirror_groups, mirror_pairs, outlink_docs
from tests.conftest import edges_df


def _fixture(spark):
    # a and b: byte-identical outlink sets (exact mirrors)
    # c: shares 3 of the union-of-5 with a  -> jaccard 0.6
    # d: disjoint; e: single outlink (dropped by min_out=2)
    pairs = (
        [("a", t) for t in ("x", "y", "z", "w")]
        + [("b", t) for t in ("x", "y", "z", "w")]
        + [("c", t) for t in ("x", "y", "z", "v")]
        + [("d", t) for t in ("p", "q")]
        + [("e", "x")]
        # duplicate edge must not change the set semantics
        + [("a", "x")]
    )
    return edges_df(spark, pairs)


def test_outlink_docs_set_semantics(spark):
    docs = {r["doc_id"]: r["text"] for r in outlink_docs(_fixture(spark)).collect()}
    assert docs["a"] == docs["b"] == "w x y z"
    assert docs["c"] == "v x y z"
    assert "e" not in docs  # min_out=2 drops single-outlink pages


def test_exact_mirror_groups(spark):
    groups = exact_mirror_groups(_fixture(spark)).collect()
    assert len(groups) == 1
    assert groups[0]["keep_id"] == "a"
    assert groups[0]["n"] == 2


def test_mirror_pairs_exact_jaccard(spark):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in mirror_pairs(_fixture(spark), threshold=0.5).collect()
    }
    # the a/b exact group collapses to representative 'a'; (a, c)
    # shares {x,y,z} of union {v,w,x,y,z} -> 0.6; d is below threshold
    assert got == {("a", "c"): 0.6}
    # without collapsing, b surfaces too (b-c pair plus the a-b mirror)
    got2 = {
        (r["a"], r["b"]): r["jaccard"]
        for r in mirror_pairs(
            _fixture(spark), threshold=0.5, collapse_exact=False
        ).collect()
    }
    assert got2 == {("a", "b"): 1.0, ("a", "c"): 0.6, ("b", "c"): 0.6}
