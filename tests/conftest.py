from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pregel_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pregel_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


def edges_df(spark, pairs, weight=1.0):
    """Build an edges DataFrame from [(src, dst), ...] string pairs."""
    rows = [(str(a), str(b), float(weight)) for a, b in pairs]
    return spark.createDataFrame(rows, "src string, dst string, weight double")
