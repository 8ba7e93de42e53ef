"""S8 parity: the reference bundles full Avro container I/O
(``pregel/avro/c.lua:1298-1452``, ``pregel/avro/init.lua:15-39``). Our
storage seam is parquet+manifest (tableio.py), but the engine is
format-agnostic behind ``spark.read``/``df.write`` — this test proves
the Avro round-trip whenever the ``spark-avro`` connector module is
deployed (``--packages org.apache.spark:spark-avro_2.13:<ver>``), and
skips with an explicit reason in containers that ship only the avro
core jars (as this one does — connector absence documented in
README.md)."""

from __future__ import annotations

import pytest


def test_avro_roundtrip_if_connector_present(spark, tmp_path):
    df = spark.createDataFrame(
        [("u1", 0.25, True), ("u2", 0.75, False)],
        "id string, rank double, halted boolean",
    )
    path = str(tmp_path / "avro_t")
    try:
        df.write.mode("overwrite").format("avro").save(path)
    except Exception as e:  # connector module not deployed
        assert "Failed to find data source: avro" in str(e)
        pytest.skip("spark-avro connector module not in this container")
    back = spark.read.format("avro").load(path)
    assert sorted((r["id"], r["rank"], r["halted"]) for r in back.collect()) == [
        ("u1", 0.25, True),
        ("u2", 0.75, False),
    ]
