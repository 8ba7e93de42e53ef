"""Driver-contract smoke: `__spark_entry__` must keep its three-function
shape (`entry`, `queries`, `oracle_sql`) working end-to-end. The full
value-exact sweep lives in `scripts/check_oracles.py` (mirrors the
driver's gate); this test pins the contract surface itself so a
refactor can't silently break the harness between local runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_entry_runs_with_stable_schema(spark):
    df = entrymod.entry(spark)
    assert isinstance(df, DataFrame)
    assert df.columns == ["id", "rank", "out_deg", "in_deg"]
    rows = df.collect()
    assert len(rows) > 0
    # flagship is a top-100 rank list: descending, deterministic head
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_contract_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 54
    # every oracle key must have a query; only documented
    # non-SQL-expressible ops may lack an oracle
    assert set(oracles) <= set(qs)
    assert set(qs) - set(oracles) == {"pagerank_full", "simsearch_ivf"}
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


@pytest.mark.parametrize(
    "name",
    ["degrees", "dedup_exact", "token_stats", "comp_sizes_topk"],
)
def test_representative_queries_return_rows(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert isinstance(df, DataFrame)
    assert df.count() > 0
