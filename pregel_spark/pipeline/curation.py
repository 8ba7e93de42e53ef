"""Training-mix curation: deterministic stratified sampling.

Assembling an LLM training mix means sampling each stratum (language,
source, quality band) at its own rate. ``df.sample`` is partition- and
run-dependent; here membership is a PURE FUNCTION of
(id, seed, stratum rate) via the engine-portable seeded 60-bit hash
(``pipeline/hashing``, same family as ``graph.build.vertex_sample_pred``)
— so the same document keeps/drops identically across reruns,
repartitionings, engines (DuckDB twin below), and across every table
its id appears in (text, embeddings, metadata stay aligned with zero
joins).

Scale shape: one scan-time filter — the rate lookup is a literal CASE
chain compiled from the rates dict (strata counts are human-sized),
the hash is native md5 arithmetic; no shuffle, no join, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_PPM = 1_000_000


def _ppm(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(round(rate * _PPM))


def stratified_sample_pred(
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> Column:
    """Boolean keep-predicate: hash(id, seed) mod 1e6 < ppm(rate of
    this row's stratum). Rates are quantized to ppm. Strata missing
    from ``rates`` use ``default_rate``."""
    from .hashing import seeded_hash60

    expr = F.lit(_ppm(default_rate))
    # build the CASE chain in sorted-key order (deterministic plan)
    for stratum in sorted(rates):
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(_ppm(rates[stratum]))
        ).otherwise(expr)
    return F.pmod(seeded_hash60(seed, F.col(id_col)), F.lit(_PPM)) < expr


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Filter ``docs`` to the stratified sample (see module docstring)."""
    return docs.filter(
        stratified_sample_pred(rates, strata_col, id_col, default_rate, seed)
    )


def duckdb_stratified_sample_pred(
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`stratified_sample_pred` (oracle surface)."""
    from .hashing import duckdb_seeded_hash60

    case = " ".join(
        f"WHEN {strata_col} = '{s}' THEN {_ppm(rates[s])}" for s in sorted(rates)
    )
    return (
        f"(({duckdb_seeded_hash60(seed, id_col)}) % {_PPM}) < "
        f"(CASE {case} ELSE {_ppm(default_rate)} END)"
    )
