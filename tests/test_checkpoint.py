"""Checkpoint/resume: interrupted run + resume == uninterrupted run
(SURVEY.md §5 item 5; north_rule 'resumes mid-superstep')."""

from __future__ import annotations

import numpy as np

from pregel_spark.graph import connected_components, pagerank
from pregel_spark.tableio import CheckpointManager, read_manifest, write_table
from tests.conftest import edges_df
from tests.graphs import TOY7, two_components


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_tableio_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    man = write_table(df, str(tmp_path / "t"), meta={"x": 1})
    assert read_manifest(str(tmp_path / "t"))["meta"] == {"x": 1}
    back = spark.read.parquet(str(tmp_path / "t"))
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_pagerank_resume_identical(spark, tmp_path):
    pairs = TOY7
    e = edges_df(spark, pairs)
    full = pagerank(spark, e, tol=0.0, max_iter=10)

    ck = str(tmp_path / "ck")
    # run 1: "killed" after superstep 6 (checkpoint_interval=3 -> 3,6 saved)
    part = pagerank(
        spark, e, tol=0.0, max_iter=6, checkpoint_dir=ck, run_id="r1",
        checkpoint_interval=3,
    )
    assert CheckpointManager(ck, "r1").completed_supersteps() == [3, 6]
    # run 2: resume from latest checkpoint, continue to 10
    res = pagerank(
        spark, e, tol=0.0, max_iter=10, checkpoint_dir=ck, run_id="r1",
        checkpoint_interval=3, resume=True,
    )
    assert res.supersteps == 10
    g_full, g_res = _ranks(full.vertices), _ranks(res.vertices)
    assert set(g_full) == set(g_res)
    for v in g_full:
        assert np.isclose(g_full[v], g_res[v], atol=1e-14), v
    # metrics table was persisted, one row per superstep (no dup appends)
    m = CheckpointManager(ck, "r1").read_metrics(spark)
    assert m.count() >= 2
    assert m.count() == m.select("superstep").distinct().count()
    # I5 per-partition metrics: every superstep's partition rows sum to N
    pm = CheckpointManager(ck, "r1").read_partition_metrics(spark).collect()
    n_vertices = len(_ranks(full.vertices))
    by_step = {}
    for r in pm:
        by_step.setdefault(r["superstep"], 0)
        by_step[r["superstep"]] += r["rows"]
    assert by_step and all(v == n_vertices for v in by_step.values()), by_step


def test_cc_resume_identical(spark, tmp_path):
    pairs = two_components(n=20)
    e = edges_df(spark, pairs)
    full = connected_components(spark, e)
    ck = str(tmp_path / "ck2")
    connected_components(
        spark, e, max_iter=2, checkpoint_dir=ck, run_id="r2",
        checkpoint_interval=2,
    )
    res = connected_components(
        spark, e, checkpoint_dir=ck, run_id="r2", checkpoint_interval=2,
        resume=True,
    )
    got_full = {r["id"]: r["component"] for r in full.vertices.collect()}
    got_res = {r["id"]: r["component"] for r in res.vertices.collect()}
    assert got_full == got_res
    assert res.converged
