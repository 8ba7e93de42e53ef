"""Deterministic vertex-induced graph sampling (build.sample_subgraph).

The load-bearing property is that membership is a pure function of
(id, seed): stable under repartitioning (df.sample is NOT), consistent
across every table the id appears in, and reproducible by the DuckDB
twin predicate.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pregel_spark.graph import sample_subgraph, vertex_sample_pred
from pregel_spark.graph.build import duckdb_vertex_sample_pred

from conftest import edges_df


def _ring_edges(spark, n=400):
    return edges_df(spark, [(f"v{i}", f"v{(i + 1) % n}") for i in range(n)])


def test_invariant_under_repartitioning(spark):
    e = _ring_edges(spark)
    a = {(r.src, r.dst) for r in sample_subgraph(e.repartition(7), 0.4, seed=3).collect()}
    b = {(r.src, r.dst) for r in sample_subgraph(e.repartition(3), 0.4, seed=3).collect()}
    assert a == b and 0 < len(a) < 400


def test_induced_property_and_cross_table_consistency(spark):
    e = _ring_edges(spark)
    kept_edges = sample_subgraph(e, 0.5, seed=1)
    # every endpoint of a surviving edge passes the vertex predicate
    # evaluated on a DIFFERENT table (the vertex list)
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select("dst"))
        .distinct()
        .filter(vertex_sample_pred(F.col("id"), 0.5, seed=1))
    )
    kept_ids = {r.id for r in verts.collect()}
    for r in kept_edges.collect():
        assert r.src in kept_ids and r.dst in kept_ids


def test_fraction_accuracy_and_extremes(spark):
    ids = spark.range(5000).select(F.concat(F.lit("u"), "id").alias("id"))
    frac = (
        ids.filter(vertex_sample_pred(F.col("id"), 0.3, seed=9)).count() / 5000
    )
    assert abs(frac - 0.3) < 0.03
    assert ids.filter(vertex_sample_pred(F.col("id"), 0.0, seed=9)).count() == 0
    assert ids.filter(vertex_sample_pred(F.col("id"), 1.0, seed=9)).count() == 5000
    with pytest.raises(ValueError):
        vertex_sample_pred(F.col("id"), 1.5)


def test_duckdb_twin_matches_spark(spark):
    ids = [f"page-{i}" for i in range(500)]
    df = spark.createDataFrame([(i,) for i in ids], "id string")
    spark_kept = {
        r.id for r in df.filter(vertex_sample_pred(F.col("id"), 0.37, seed=11)).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE v (id VARCHAR)")
    con.executemany("INSERT INTO v VALUES (?)", [(i,) for i in ids])
    duck_kept = {
        r[0]
        for r in con.execute(
            f"SELECT id FROM v WHERE {duckdb_vertex_sample_pred('id', 0.37, 11)}"
        ).fetchall()
    }
    assert spark_kept == duck_kept and 0 < len(duck_kept) < 500
