"""North-rule storage parity: the rule targets Iceberg tables; the
engine's storage seam (``tableio.write_table/read_table``) carries an
``fmt='iceberg'`` path that round-trips whenever the
``iceberg-spark-runtime`` jar is deployed, and skips with an explicit
reason in containers (like this one) that ship no Iceberg runtime —
the same env-gating pattern as ``test_avro.py`` for the S8 Avro
connector."""

from __future__ import annotations

import pytest

from pregel_spark.tableio import read_table, write_table


def test_iceberg_roundtrip_if_runtime_present(spark, tmp_path):
    df = spark.createDataFrame(
        [("u1", 0.25, 3), ("u2", 0.75, 4)], "id string, rank double, step long"
    )
    path = str(tmp_path / "ice_t")
    try:
        write_table(df, path, fmt="iceberg")
    except Exception as e:
        # skip ONLY for the missing data source; any other Iceberg
        # error (e.g. v1 save() cannot create a new table — see
        # write_table docstring) must fail loudly so a deployer with
        # the jar sees the real problem instead of a silent skip
        msg = str(e)
        missing = "DATA_SOURCE_NOT_FOUND" in msg or (
            "Failed to find" in msg and "data source: iceberg" in msg
        )
        if not missing:
            raise
        pytest.skip("iceberg-spark-runtime not in this container")
    back = read_table(spark, path, fmt="iceberg")
    assert sorted((r["id"], r["rank"], r["step"]) for r in back.collect()) == [
        ("u1", 0.25, 3),
        ("u2", 0.75, 4),
    ]


def test_write_table_rejects_unknown_fmt(spark, tmp_path):
    df = spark.createDataFrame([("a",)], "id string")
    with pytest.raises(ValueError):
        write_table(df, str(tmp_path / "x"), fmt="orcish")
