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
