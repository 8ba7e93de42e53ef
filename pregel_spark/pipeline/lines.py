"""Line-level corpus operators: C4-style line dedup and sequence packing.

Web-scale training corpora dedup at *line* granularity (C4, Raffel et
al. 2020: "we discard all but one of any three-sentence span occurring
more than once"): boilerplate (nav bars, cookie banners, footers)
repeats across millions of pages while the surrounding documents stay
unique, so document-level dedup never catches it. The reference engine
exposes the same building blocks through its tuple pipeline (scan ->
project -> group, `pregel/avro/frontend.lua` record streams); here each
step is a declarative DataFrame op.

Scale design:
- ``line_dedup``: two shuffles total — one ``groupBy(line)`` to elect
  the global first occurrence (map-side partial agg collapses the hot
  boilerplate lines early: a line repeated 10M times leaves each map
  task as ONE row), one ``groupBy(doc)`` to rebuild texts. No windows,
  no Python, no driver collection.
- ``pack_sequences``: a global ordered cumulative sum WITHOUT a
  single-partition window — range-repartition by id, per-partition
  running totals under ``Window.partitionBy(spark_partition_id)``
  (parallel: each partition sorts locally), then tiny per-partition
  totals are collected (one row per partition), prefix-summed on the
  driver, and broadcast-joined back. Same decomposition as
  ``graph.build.order_preserving_id_map``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import tokens_col


def split_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Explode documents into (id, pos, line) — pos is 1-based.

    Blank lines are kept (they are positions, and rebuilding must
    round-trip); callers that want them gone filter afterwards.
    """
    parts = F.split(F.col(text_col), F.lit(sep), -1)
    ex = docs.select(
        F.col(id_col), F.posexplode(parts).alias("pos0", "line")
    )
    return ex.select(
        id_col, (F.col("pos0") + 1).cast("int").alias("pos"), "line"
    )


def chunk_lines(
    docs: DataFrame,
    n_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pseudo-lines for corpora without newlines: consecutive
    ``n_tokens``-token spans of the whitespace token stream, as
    (id, pos, line) with 1-based pos. The last span may be short.
    Empty/whitespace-only docs produce no rows.

    Fully native: one ``transform`` over a ``sequence`` of chunk
    indices + ``slice`` — zero Python in the row path.
    """
    if n_tokens < 1:
        raise ValueError(f"n_tokens must be >= 1, got {n_tokens}")
    toks = tokens_col(text_col)
    n_chunks = F.ceil(F.size(toks) / F.lit(n_tokens)).cast("int")
    idx = F.sequence(F.lit(1), n_chunks)
    chunks = F.transform(
        idx,
        lambda i: F.array_join(
            F.slice(toks, (i - 1) * n_tokens + 1, n_tokens), " "
        ),
    )
    ex = docs.filter(F.size(toks) > 0).select(
        F.col(id_col), F.posexplode(chunks).alias("pos0", "line")
    )
    return ex.select(
        id_col, (F.col("pos0") + 1).cast("int").alias("pos"), "line"
    )


def line_dedup(
    lines: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """C4-style global line dedup: every occurrence of a line except the
    FIRST (smallest ``(id, pos)`` over the whole corpus) is dropped,
    and documents are rebuilt from their surviving lines in order.

    Returns one row per input document:
    ``(id, text, n_lines_kept, n_lines_dropped)`` — ``text`` is the
    surviving lines joined by ``sep`` ('' when nothing survives).

    Deterministic: the keeper is the min struct ``(id, pos)``, so the
    result is independent of partitioning (there is exactly one global
    first occurrence). The election is ONE aggregation over the lines
    table — the hot boilerplate lines partial-aggregate map-side, so
    skew (one line in 10M docs) never concentrates rows on a reducer.
    """
    key = F.struct(F.col(id_col), F.col("pos"))
    first = lines.groupBy("line").agg(F.min(key).alias("_first"))
    kept = (
        lines.join(first, "line")
        .filter(
            (F.col(id_col) == F.col(f"_first.{id_col}"))
            & (F.col("pos") == F.col("_first.pos"))
        )
        .drop("_first")
    )
    return _rebuild_docs(kept, lines, docs, id_col, text_col, sep)


def _rebuild_docs(
    kept: DataFrame,
    lines: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    sep: str,
) -> DataFrame:
    """(id, text, n_lines_kept, n_lines_dropped) from surviving lines —
    shared tail of every line-filtering operator: one groupBy(doc)
    rebuild + one groupBy(doc) total, left-joined onto ALL input docs
    (documents losing every line come back with text='')."""
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("_new_text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_total"))
    return (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("_new_text", F.lit("")).alias(text_col),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
            (
                F.coalesce("_n_total", F.lit(0))
                - F.coalesce("n_lines_kept", F.lit(0))
            ).alias("n_lines_dropped"),
        )
    )


def boilerplate_lines(
    lines: DataFrame,
    docs: DataFrame,
    frac: float = 0.3,
    min_docs: int = 2,
    id_col: str = "doc_id",
    host_col: str = "source",
) -> DataFrame:
    """Host-level boilerplate census (CCNet/RefinedWeb-style): a line is
    boilerplate for a host when it appears in at least
    ``max(min_docs, ceil(frac · docs_of_host))`` DISTINCT documents of
    that host — nav bars, cookie banners, footers repeat across most of
    a site's pages while staying rare globally, which is exactly why
    per-host normalization beats the global census ``line_dedup`` runs.

    Returns ``(host, line, n_docs, host_docs)`` for qualifying lines.

    Scale: the (host, line, doc) triples dedupe in ONE shuffle whose
    map-side partial collapses each site's hot lines early; the
    per-host doc totals are a hosts-sized table (≪ docs) joined on
    ``host``. No windows, no Python.
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    hosted = lines.join(docs.select(id_col, host_col), id_col)
    per_line = (
        hosted.select(host_col, "line", id_col)
        .distinct()
        .groupBy(host_col, "line")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    host_docs = docs.groupBy(host_col).agg(
        F.countDistinct(id_col).cast("long").alias("host_docs")
    )
    thresh = F.greatest(
        F.lit(min_docs).cast("long"),
        F.ceil(F.lit(frac) * F.col("host_docs")).cast("long"),
    )
    return (
        per_line.join(host_docs, host_col)
        .filter(F.col("n_docs") >= thresh)
        .select(
            F.col(host_col).alias("host"), "line", "n_docs", "host_docs"
        )
    )


def strip_boilerplate(
    lines: DataFrame,
    docs: DataFrame,
    frac: float = 0.3,
    min_docs: int = 2,
    id_col: str = "doc_id",
    host_col: str = "source",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Remove each host's boilerplate lines (``boilerplate_lines``) from
    its documents and rebuild texts in line order. Returns one row per
    input document: ``(id, text, n_lines_kept, n_lines_dropped)``.

    Unlike ``line_dedup`` (which KEEPS the global first occurrence),
    boilerplate is dropped from EVERY document — a cookie banner's
    first sighting is as worthless as its millionth.

    Scale: the boilerplate table is (hosts × frequent lines) — orders
    of magnitude smaller than the corpus; at cluster scale hint it
    broadcast for an exchange-free anti-join (left as a hash anti-join
    here so Spark's AQE picks broadcast when it fits).
    """
    bp = boilerplate_lines(
        lines, docs, frac=frac, min_docs=min_docs,
        id_col=id_col, host_col=host_col,
    ).select(F.col("host").alias(host_col), "line")
    hosted = lines.join(docs.select(id_col, host_col), id_col)
    kept = hosted.join(bp, [host_col, "line"], "left_anti").drop(host_col)
    return _rebuild_docs(kept, lines, docs, id_col, text_col, sep)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training shards.

    Documents are laid out in ``id`` order; each doc's ``start_offset``
    is the corpus-wide token count before it, and its shard is
    ``floor(start_offset / budget)`` (the shard its first token lands
    in — docs longer than ``budget`` simply span into later shards,
    the standard concat-then-chunk LM packing).

    Returns ``(id, n_tokens, start_offset, shard_id)``.

    A naive ``Window.orderBy(id)`` cumulative sum funnels the whole
    corpus through ONE partition; instead: range-repartition by id (so
    partition p holds a contiguous id range), cumsum inside each
    partition in parallel, collect the per-partition totals (one tiny
    row each), prefix-sum them on the driver, broadcast the offsets
    back. Two scans, no global sort bottleneck.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    spark = docs.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    sized = (
        docs.select(F.col(id_col), F.size(tokens_col(text_col)).alias("n_tokens"))
        .repartitionByRange(n_part, id_col)
        .withColumn("_p", F.spark_partition_id())
        # freeze the layout: _p must agree between the cumsum pass and
        # the offsets pass below (same rationale as order_preserving_id_map)
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("_p")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sized.withColumn(
        "_end", F.sum("n_tokens").over(w).cast("long")
    )
    counts = (
        sized.groupBy("_p").agg(F.sum("n_tokens").alias("_c")).collect()
    )
    offsets, cum = [], 0
    for r in sorted(counts, key=lambda r: r["_p"]):
        offsets.append((r["_p"], cum))
        cum += r["_c"] or 0
    odf = spark.createDataFrame(offsets, "_p int, _off long")
    start = F.col("_off") + F.col("_end") - F.col("n_tokens")
    return (
        local.join(F.broadcast(odf), "_p")
        .select(
            id_col,
            "n_tokens",
            start.alias("start_offset"),
            F.floor(start / F.lit(budget)).cast("long").alias("shard_id"),
        )
    )
