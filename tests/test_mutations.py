"""Topology mutation utilities vs the reference's barrier-ordered
application semantics (pregel/worker.lua:196-309)."""

from __future__ import annotations

from pregel_spark.graph.mutations import (
    add_edges,
    add_vertices,
    apply_mutations,
    delete_edges,
    delete_vertices,
)
from tests.conftest import edges_df


def _vdf(spark, ids):
    return spark.createDataFrame([(i, 0) for i in ids], "id string, value long")


def test_add_vertices_first_writer_wins(spark):
    v = spark.createDataFrame([("a", 1), ("b", 2)], "id string, value long")
    new = spark.createDataFrame([("b", 99), ("c", 3)], "id string, value long")
    got = {r["id"]: r["value"] for r in add_vertices(v, new).collect()}
    assert got == {"a": 1, "b": 2, "c": 3}


def test_add_vertices_intra_batch_deterministic(spark):
    # duplicate ids within ONE batch keep the min-by-value-struct row,
    # regardless of input order/partitioning
    v = spark.createDataFrame([("a", 1)], "id string, value long")
    for batch in (["x", 5, "x", 2, "x", 9], ["x", 9, "x", 2, "x", 5]):
        rows = [(batch[i], batch[i + 1]) for i in range(0, len(batch), 2)]
        new = spark.createDataFrame(rows, "id string, value long").repartition(3)
        got = {r["id"]: r["value"] for r in add_vertices(v, new).collect()}
        assert got == {"a": 1, "x": 2}


def test_add_edges_keeps_existing_weight(spark):
    e = edges_df(spark, [("a", "b")], weight=5.0)
    new = edges_df(spark, [("a", "b"), ("b", "c")], weight=1.0)
    got = {(r["src"], r["dst"]): r["weight"] for r in add_edges(e, new).collect()}
    assert got == {("a", "b"): 5.0, ("b", "c"): 1.0}


def test_delete_vertex_cascades_both_directions(spark):
    v = _vdf(spark, ["a", "b", "c"])
    e = edges_df(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("b", "a")])
    dels = spark.createDataFrame([("a",)], "id string")
    v2, e2 = delete_vertices(v, e, dels)
    assert {r["id"] for r in v2.collect()} == {"b", "c"}
    assert {(r["src"], r["dst"]) for r in e2.collect()} == {("b", "c")}


def test_delete_edges_exact_pairs(spark):
    e = edges_df(spark, [("a", "b"), ("b", "a"), ("b", "c")])
    dels = edges_df(spark, [("a", "b")])
    got = {(r["src"], r["dst"]) for r in delete_edges(e, dels).collect()}
    assert got == {("b", "a"), ("b", "c")}


def test_apply_mutations_barrier_order(spark):
    # order: del-edges, del-vertices, add-vertices, add-edges
    v = _vdf(spark, ["a", "b"])
    e = edges_df(spark, [("a", "b"), ("b", "a")])
    v2, e2 = apply_mutations(
        v,
        e,
        del_edges=edges_df(spark, [("a", "b")]),
        del_vertices=spark.createDataFrame([("b",)], "id string"),
        new_vertices=spark.createDataFrame([("c", 7)], "id string, value long"),
        new_edges=edges_df(spark, [("a", "c")]),
    )
    assert {r["id"] for r in v2.collect()} == {"a", "c"}
    assert {(r["src"], r["dst"]) for r in e2.collect()} == {("a", "c")}


def test_add_vertices_map_typed_values(spark):
    # map columns are not orderable in Spark: the deterministic
    # min-struct path must fall back to dropDuplicates instead of
    # raising AnalysisException
    verts = spark.createDataFrame(
        [("a", {"k": "1"})], "id string, props map<string,string>"
    )
    new = spark.createDataFrame(
        [("a", {"k": "2"}), ("b", {"k": "3"}), ("b", {"k": "3"})],
        "id string, props map<string,string>",
    )
    out = {r["id"]: r["props"] for r in add_vertices(verts, new).collect()}
    assert out["a"] == {"k": "1"}  # existing row wins
    assert out["b"] == {"k": "3"}
    assert len(out) == 2
