"""Engine-portable hashing for dedup/fingerprint operators.

``xxhash64`` is Spark-internal: no other engine reproduces it, so any
operator built on it can only ever be rows-count-checked by an external
oracle. ``hash60`` instead takes the first 15 hex digits (60 bits) of
md5 — computable bit-identically in DuckDB
(``('0x' || substr(md5(x),1,15))::UBIGINT::BIGINT``), Postgres, Python,
anywhere — and fits a signed 64-bit long without sign issues. md5 is
~2-5x slower per call than xxhash64 but both run JVM-side inside
codegen; for one-shot pipeline scans the cross-engine verifiability is
worth it (operators keep a ``hash_fn='xxhash64'`` escape hatch for
maximum throughput).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: DuckDB expression template for the same 60-bit hash ({x} = SQL expr)
DUCKDB_HASH60 = "(('0x' || substr(md5({x}), 1, 15))::UBIGINT::BIGINT)"


def hash60(col: Column | str) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5 as a long."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def seeded_hash60(seed: int, col: Column | str) -> Column:
    """``hash60`` of ``"<seed>:" || col`` — a seeded portable family.
    (MinHash does NOT use this: its signatures take four 32-bit
    quarters per md5 digest — see ``dedup.minhash_signatures`` — to
    quarter the digest count; this 60-bit variant suits operators that
    need one wide hash per seed, e.g. winnowing.)"""
    return hash60(F.concat(F.lit(f"{seed}:"), col))


def duckdb_seeded_hash60(seed: int, x: str) -> str:
    return DUCKDB_HASH60.format(x=f"('{seed}:' || {x})")
