"""Quick A/B timer: run a named subset of __spark_entry__ queries at
$SPARK_GRAFT_SF_DIR (default sf0.1) and print one JSON line of
per-query seconds.  Used to compare a working-tree change against the
committed code (run, `git stash`, run, compare)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pregel_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
NAMES = sys.argv[1:] or [
    "triangle_count",
    "cocitation",
    "adamic_adar",
    "jaccard_pairs",
    "modularity_lpa",
    "refine_modularity",
    "dedup_minhash",
    "dedup_simhash",
    "curate",
    "dedup_containment",
    "truss5_r2",
]


def main() -> None:
    spark = get_spark(
        "pregel_spark_ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in NAMES:
        print(f"[ab] {name} ...", file=sys.stderr, flush=True)
        t0 = time.monotonic()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
    print(json.dumps({"queries": timings, "total": round(sum(timings.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
