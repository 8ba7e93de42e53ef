"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from pregel_spark.session import get_spark


def canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    # queries round SQL-side; round(9) here only
                    # normalizes -0.0/ulp noise without masking
                    # sub-1e-6 regressions the driver would catch
                    v = round(v, 9)
                    v = 0.0 if v == 0 else v
            vals.append((c, str(v)))
        out.append(tuple(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK RAISED {type(e).__name__}: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB RAISED: {e}"))
            print(f"[FAIL-duck] {name}: {e}")
            continue
        if scols != ocols:
            failures.append((name, f"cols differ: spark={scols} duck={ocols}"))
            print(f"[FAIL-cols] {name}: spark={scols} duck={ocols}")
            continue
        s_c = canon([{c: r[c] for c in scols} for r in srows], scols)
        o_c = canon(orows, ocols)
        if len(s_c) != len(o_c):
            failures.append((name, f"rowcount spark={len(s_c)} duck={len(o_c)}"))
            print(f"[FAIL-count] {name}: spark={len(s_c)} duck={len(o_c)}")
            continue
        if s_c != o_c:
            diff = [(a, b) for a, b in zip(s_c, o_c) if a != b][:3]
            failures.append((name, f"values differ, first diffs: {diff}"))
            print(f"[FAIL-vals] {name}: first diffs {diff}")
            continue
        print(f"[OK] {name}: {len(s_c)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:", [n for n, _ in failures])
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
