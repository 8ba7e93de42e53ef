"""Reference sectioned edge-list format reader (FIXTURES.md §4)."""

from __future__ import annotations

from pregel_spark.loader import read_reference_graph

FIXTURE = """# vertices
1 'a' 10
2 'b' 20
3 'c' 5
# edges
1 2 1
2 3 1
3 1 1
"""


def test_read_reference_graph(spark, tmp_path):
    p = tmp_path / "graph.txt"
    p.write_text(FIXTURE)
    v, e = read_reference_graph(spark, str(p))
    vs = {(r["id"], r["name"], r["value"]) for r in v.collect()}
    assert vs == {("1", "a", 10), ("2", "b", 20), ("3", "c", 5)}
    es = {(r["src"], r["dst"], r["weight"]) for r in e.collect()}
    assert es == {("1", "2", 1.0), ("2", "3", 1.0), ("3", "1", 1.0)}


def test_reference_example_flow_end_to_end(spark, tmp_path):
    """The reference's complete example pipeline (example/Makefile +
    example/test-worker.lua): load the sectioned file, run max-value
    propagation with a max combiner to quiescence, check the fixpoint
    = per-component max of the loaded vertex values."""
    from pregel_spark.graph import max_propagation

    p = tmp_path / "graph.txt"
    p.write_text(FIXTURE)
    v, e = read_reference_graph(spark, str(p))
    res = max_propagation(
        spark, v.select("id", "value"), e, max_supersteps=30
    )
    got = {r["id"]: r["value"] for r in res.vertices.collect()}
    # single cycle 1->2->3->1: every vertex converges to max(10, 20, 5)
    assert got == {"1": 20, "2": 20, "3": 20}
    assert res.converged
