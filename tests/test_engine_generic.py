"""Generic Pregel tier: aggregators, no-combiner inbox, halting."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pregel_spark.graph import Pregel
from tests.conftest import edges_df
from tests.graphs import TOY7


def test_aggregator_roundtrip_and_collect_inbox(spark):
    """Superstep 1: every vertex sends its value to neighbors (no
    combiner -> full inbox list). Superstep 2: each vertex stores the
    SUM of its inbox plus the global aggregator value from superstep 1
    (aggregator = total of all vertex values — visible next superstep,
    reference README.md:274-279)."""
    pairs = TOY7
    ids = sorted({x for e in pairs for x in e})
    vdf = spark.createDataFrame(
        [(v, i + 1) for i, v in enumerate(ids)], "id string, value long"
    )

    def compute(pdf: pd.DataFrame, ctx) -> pd.DataFrame:
        out = []
        values = []
        for _, row in pdf.iterrows():
            if ctx.superstep == 1:
                dsts = row["dsts"] if isinstance(row.get("dsts"), (list,)) else (
                    list(row["dsts"]) if row.get("dsts") is not None else []
                )
                out.append([(d, int(row["value"])) for d in dsts])
                values.append(int(row["value"]))
            else:
                msgs = row["msgs"]
                inbox = list(msgs) if msgs is not None else []
                total = int(ctx.aggregators.get("total_value", 0))
                values.append(int(sum(inbox)) + total)
                out.append([])
        return pd.DataFrame(
            {"id": pdf["id"], "value": values, "halted": True, "out": out}
        )

    res = Pregel(spark, vdf, edges_df(spark, pairs)).run(
        compute=compute,
        value_type="long",
        msg_type="long",
        combiner=None,
        max_supersteps=3,
        aggregators={
            "total_value": (0, lambda df: F.sum("value"))
        },
    )
    got = {r["id"]: r["value"] for r in res.vertices.collect()}
    vals = {v: i + 1 for i, v in enumerate(ids)}
    total_after_s1 = sum(vals.values())
    inbox = {v: 0 for v in ids}
    for s, t in pairs:
        inbox[t] += vals[s]
    # vertices with no inbox halt and never recompute in superstep 2
    want = {
        v: (inbox[v] + total_after_s1 if inbox[v] > 0 else vals[v])
        for v in ids
    }
    assert got == want
    assert res.converged
