"""Plan-hygiene audit over every driver-contract query.

For each `queries()` entry, build the result DataFrame at sf0.001 and
scan its FORMATTED physical plan for anti-patterns that would not
survive 100x data:

- ``CartesianProduct`` / unbroadcast nested-loop joins — quadratic;
- ``BatchEvalPython`` — row-at-a-time Python in the data plane (the
  slow path; Arrow/``ArrowEvalPython``/``MapInPandas`` are the
  sanctioned vectorized escape hatches and are themselves only allowed
  where whitelisted below);
- absence of any ``WholeStageCodegen`` span (everything fell off the
  codegen path).

Caveat: for the BSP loops (pagerank_*, lpa_*, connected_components*,
sssp_*, hits_*, …) the returned DataFrame is the post-loop
materialized state, so this audit proves only that the *output* plan
is clean; the per-superstep plans are audited in BASELINE.md ("plan
audit" sections) and regression-tested by the scaling protocol.
For the 30+ lazy pipeline/relational queries the returned plan IS the
whole pipeline, end to end.

Writes PLAN_AUDIT.json; exits 1 on any non-whitelisted violation.

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod
from pregel_spark.session import get_spark

# sanctioned vectorized-Python and broadcast-nested-loop sites
ALLOW = {
    # IVF centroid assignment is a pandas_udf (NumPy argmin over the
    # broadcast centroid matrix) by design — documented scale path
    "simsearch_ivf": {"ArrowEvalPython", "BroadcastNestedLoopJoin"},
    # brute-force top-k broadcasts the (small) query set and scores
    # corpus x queries — the broadcast NLJ is the intended plan
    "simsearch_topk": {"BroadcastNestedLoopJoin"},
    "dedup_embedding": {"BroadcastNestedLoopJoin"},
    # media decode plumbing is mapInPandas by contract (binary columns)
    "media_features": {"ArrowEvalPython", "MapInPandas"},
    # BM25/TF-IDF re-inject the 1-row (N, avgdl) scalar table via a
    # broadcast cross join — the sanctioned scalar-broadcast shape
    # (never a driver collect inside the plan)
    "bm25": {"BroadcastNestedLoopJoin"},
    "tfidf": {"BroadcastNestedLoopJoin"},
    "unigram_lm": {"BroadcastNestedLoopJoin"},
    # modularity / its local-move refinement re-inject the 1-row edge
    # total m the same way
    "modularity_lpa": {"BroadcastNestedLoopJoin"},
    "refine_modularity": {"BroadcastNestedLoopJoin"},
}
RED = ("CartesianProduct", "BatchEvalPython")
VECTOR = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # AQE off for the audit only: an unexecuted AdaptiveSparkPlan
    # carries no codegen-id annotations, so the static plan is the one
    # that exposes codegen coverage at planning time
    spark = get_spark(
        "plan-audit",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    report, violations = {}, []
    for name, fn in sorted(entrymod.queries().items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": str(e)[:200]}
            violations.append((name, "error"))
            continue
        allowed = ALLOW.get(name, set())
        flags = {
            "cartesian": "CartesianProduct" in plan,
            "bnl_join": "BroadcastNestedLoopJoin" in plan,
            "batch_eval_python": "BatchEvalPython" in plan,
            "vectorized_python": [m for m in VECTOR if m in plan],
            # formatted mode annotates codegen as "[codegen id : N]"
            # ("WholeStageCodegen" only appears in simple/extended mode)
            "codegen_spans": len(
                {
                    seg.split("]")[0].strip()
                    for seg in plan.split("[codegen id :")[1:]
                }
            ),
        }
        report[name] = flags
        for marker in RED:
            if marker in plan and marker not in allowed:
                violations.append((name, marker))
        if flags["bnl_join"] and "BroadcastNestedLoopJoin" not in allowed:
            violations.append((name, "BroadcastNestedLoopJoin"))
        for m in flags["vectorized_python"]:
            if m not in allowed:
                violations.append((name, m))
    out = {
        "sf_dir": sf_dir,
        "queries": report,
        "violations": [f"{n}: {m}" for n, m in violations],
        "clean": not violations,
    }
    with open(os.path.join(REPO, "PLAN_AUDIT.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"violations": out["violations"], "clean": out["clean"]}))
    spark.stop()
    sys.exit(0 if not violations else 1)


if __name__ == "__main__":
    main()
