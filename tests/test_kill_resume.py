"""True crash-resume: SIGKILL a PageRank run mid-flight in a separate
process, resume from its checkpoints in this process, and match an
uninterrupted run exactly (north_rule: 'resumes mid-superstep')."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import numpy as np

from pregel_spark.graph import pagerank
from pregel_spark.synth import synth_edges
from pregel_spark.tableio import CheckpointManager

CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
from pregel_spark.session import get_spark
from pregel_spark.graph import pagerank
from pregel_spark.synth import synth_edges

spark = get_spark("kill-child", master="local[4]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
edges = synth_edges(spark, n_edges=50000, seed=7)
pagerank(
    spark, edges, tol=0.0, max_iter=500,
    checkpoint_dir={ckpt!r}, run_id="kill", checkpoint_interval=2,
)
"""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sigkill_then_resume_matches_uninterrupted(spark, tmp_path):
    ckpt_root = str(tmp_path / "ck")
    child_src = CHILD.format(repo=REPO, ckpt=ckpt_root)
    proc = subprocess.Popen(
        [sys.executable, "-c", child_src],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    cm = CheckpointManager(ckpt_root, "kill")
    deadline = time.monotonic() + 300
    try:
        while time.monotonic() < deadline:
            if len(cm.completed_supersteps()) >= 2:
                break
            if proc.poll() is not None:
                raise AssertionError("child exited before being killed")
            time.sleep(1.0)
        else:
            raise AssertionError("no checkpoints appeared within 300s")
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait(30)

    latest = cm.latest()
    assert latest is not None and latest >= 2

    edges = synth_edges(spark, n_edges=50000, seed=7)
    target = max(latest + 3, 8)
    resumed = pagerank(
        spark, edges, tol=0.0, max_iter=target,
        checkpoint_dir=ckpt_root, run_id="kill", checkpoint_interval=2,
        resume=True,
    )
    clean = pagerank(spark, edges, tol=0.0, max_iter=target)
    g1 = {r["id"]: r["rank"] for r in resumed.vertices.collect()}
    g2 = {r["id"]: r["rank"] for r in clean.vertices.collect()}
    assert set(g1) == set(g2)
    for v in g2:
        assert np.isclose(g1[v], g2[v], atol=1e-12), v
    assert resumed.supersteps == target
