"""Bucketed edge-table storage: write, read-back, and exchange-free
join on the bucket key (the storage-side analog of the reference's
consistent-hash vertex placement, pregel/mpool.lua:29-42)."""

from __future__ import annotations

from pregel_spark.graph.build import save_edges_bucketed
from tests.conftest import edges_df
from tests.graphs import TOY7


def test_bucketed_roundtrip_and_join_alignment(spark, tmp_path):
    import shutil

    spark.sql("DROP TABLE IF EXISTS edges_b")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/edges_b", ignore_errors=True)
    e = edges_df(spark, TOY7)
    save_edges_bucketed(e, "edges_b", buckets=4)
    back = spark.table("edges_b")
    assert {(r["src"], r["dst"]) for r in back.collect()} == {
        (a, b) for a, b in TOY7
    }
    # joining two scans of the bucketed table on the bucket key must not
    # introduce a shuffle on either side (disable broadcast so the
    # planner actually exercises the bucketed-join path)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = back.alias("x").join(
            spark.table("edges_b").alias("y"), "src"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.sql("DROP TABLE edges_b")
