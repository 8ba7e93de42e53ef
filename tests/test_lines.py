"""Line-level dedup + sequence packing + incremental dedup + top n-grams.

Every oracle here is plain Python over collected rows — small inputs,
exact expectations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pregel_spark.pipeline import (
    chunk_lines,
    incremental_exact,
    line_dedup,
    pack_sequences,
    split_lines,
    top_ngrams,
)


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------ lines --------------------------------

def test_split_lines_positions_and_blanks(spark):
    docs = docs_df(spark, [(1, "a\n\nb"), (2, "x")])
    rows = {(r.doc_id, r.pos): r.line for r in split_lines(docs).collect()}
    assert rows == {(1, 1): "a", (1, 2): "", (1, 3): "b", (2, 1): "x"}


def test_chunk_lines_spans_and_tail(spark):
    docs = docs_df(spark, [(1, "a b c d e"), (2, "  "), (3, "q")])
    rows = sorted(
        (r.doc_id, r.pos, r.line)
        for r in chunk_lines(docs, n_tokens=2).collect()
    )
    assert rows == [
        (1, 1, "a b"),
        (1, 2, "c d"),
        (1, 3, "e"),
        (3, 1, "q"),
    ]


def test_line_dedup_keeps_global_first_occurrence(spark):
    # "nav bar" boilerplate repeats across docs; first occurrence is
    # (doc 1, pos 1) and every other copy must vanish, including the
    # SECOND copy inside doc 1 itself.
    docs = docs_df(
        spark,
        [
            (1, "nav bar\nunique one\nnav bar"),
            (2, "nav bar\nunique two"),
            (3, "nav bar"),
        ],
    )
    lines = split_lines(docs)
    out = {
        r.doc_id: (r.text, r.n_lines_kept, r.n_lines_dropped)
        for r in line_dedup(lines, docs, sep="\n").collect()
    }
    assert out == {
        1: ("nav bar\nunique one", 2, 1),
        2: ("unique two", 1, 1),
        3: ("", 0, 1),
    }


def test_line_dedup_partition_invariant(spark):
    docs = docs_df(
        spark, [(i, f"common line\nrest {i % 3}") for i in range(1, 40)]
    )
    lines = split_lines(docs)
    a = sorted(map(tuple, line_dedup(lines, docs).collect()))
    b = sorted(
        map(
            tuple,
            line_dedup(lines.repartition(7), docs.repartition(3)).collect(),
        )
    )
    assert a == b
    # doc 1 keeps "common line" + "rest 1"; docs 2/3 keep only the
    # first occurrence of their own "rest" line
    kept = {r[0]: r[2] for r in a}
    assert kept[1] == 2 and kept[2] == 1 and kept[3] == 1
    assert all(kept[i] == 0 for i in range(4, 40))


# -------------------------- pack_sequences ----------------------------

def test_pack_sequences_matches_serial_cumsum(spark):
    rows = [(i, " ".join(["w"] * (i % 7 + 1))) for i in range(1, 200)]
    docs = docs_df(spark, rows)
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.shard_id)
        for r in pack_sequences(docs, budget=25).collect()
    }
    cum = 0
    for i in range(1, 200):
        n = i % 7 + 1
        assert got[i] == (n, cum, cum // 25), i
        cum += n
    assert len(got) == 199


def test_pack_sequences_partition_invariant(spark):
    rows = [(i, " ".join(["w"] * (i % 5 + 1))) for i in range(1, 101)]
    a = {
        tuple(r)
        for r in pack_sequences(docs_df(spark, rows), budget=17).collect()
    }
    b = {
        tuple(r)
        for r in pack_sequences(
            docs_df(spark, rows).repartition(13), budget=17, num_partitions=3
        ).collect()
    }
    assert a == b


# ------------------------- incremental_exact --------------------------

def test_incremental_exact_anti_join_and_intra_batch(spark):
    base = docs_df(spark, [(1, "seen before"), (2, "also seen")])
    new = docs_df(
        spark,
        [
            (10, "seen before"),   # dup of base -> dropped
            (11, "fresh text"),    # survives
            (12, "fresh text"),    # intra-batch dup of 11 -> dropped
            (13, "other fresh"),   # survives
        ],
    )
    got = sorted(r.doc_id for r in incremental_exact(new, base).collect())
    assert got == [11, 13]


def test_incremental_exact_fingerprint_base(spark):
    base = docs_df(spark, [(1, "seen before")])
    fps = base.select(F.md5("text").alias("h"))
    new = docs_df(spark, [(10, "seen before"), (11, "fresh")])
    got = incremental_exact(new, fps, base_is_fingerprints=True).collect()
    assert [r.doc_id for r in got] == [11]


# ----------------------------- top_ngrams -----------------------------

def test_top_ngrams_counts_and_tiebreak(spark):
    docs = docs_df(
        spark,
        [
            (1, "a b a b"),   # "a b" x2, "b a" x1
            (2, "a b"),       # "a b" x1
            (3, "c d"),       # "c d" x1
        ],
    )
    rows = top_ngrams(docs, n=2, k=3).collect()
    assert [(r.ngram, r.n_occurrences, r.n_docs) for r in rows] == [
        ("a b", 3, 2),
        ("b a", 1, 1),
        ("c d", 1, 1),
    ]


# -------------------------- boilerplate ------------------------------

def hdocs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_boilerplate_lines_threshold(spark):
    from pregel_spark.pipeline import boilerplate_lines

    # host A: 4 docs, "nav bar" in 3 of them (75%); "rare" in 1
    # host B: 2 docs, "nav bar" in 1 of them (50%, but min_docs=2 blocks)
    docs = hdocs_df(spark, [
        (1, "nav bar\nbody one", "A"),
        (2, "nav bar\nbody two", "A"),
        (3, "nav bar\nrare", "A"),
        (4, "body four", "A"),
        (5, "nav bar\nbeta", "B"),
        (6, "beta2", "B"),
    ])
    lines = split_lines(docs)
    got = {
        (r.host, r.line): (r.n_docs, r.host_docs)
        for r in boilerplate_lines(lines, docs, frac=0.6, min_docs=2).collect()
    }
    assert got == {("A", "nav bar"): (3, 4)}
    # lowering frac pulls in nothing new on A (ceil(0.25*4)=1 < min_docs)
    got2 = {
        (r.host, r.line)
        for r in boilerplate_lines(lines, docs, frac=0.25, min_docs=2).collect()
    }
    assert got2 == {("A", "nav bar")}


def test_strip_boilerplate_drops_every_occurrence(spark):
    from pregel_spark.pipeline import strip_boilerplate

    docs = hdocs_df(spark, [
        (1, "nav\nalpha\nnav", "A"),   # repeated within one doc: both go
        (2, "nav\nbeta", "A"),
        (3, "gamma", "A"),
        (4, "nav", "B"),               # host B: nav is NOT boilerplate there
    ])
    lines = split_lines(docs)
    out = {
        r.doc_id: (r.text, r.n_lines_kept, r.n_lines_dropped)
        for r in strip_boilerplate(
            lines, docs, frac=0.5, min_docs=2, sep="\n"
        ).collect()
    }
    assert out[1] == ("alpha", 1, 2)
    assert out[2] == ("beta", 1, 1)
    assert out[3] == ("gamma", 1, 0)
    assert out[4] == ("nav", 1, 0)    # survives: B has only 1 doc with it
    assert len(out) == 4


def test_strip_boilerplate_partition_invariant(spark):
    from pregel_spark.pipeline import strip_boilerplate

    docs = hdocs_df(spark, [
        (i, f"header\nuniq {i}\nfooter" if i % 2 else f"uniq {i}", "H")
        for i in range(1, 21)
    ])
    a = strip_boilerplate(split_lines(docs), docs, frac=0.3, sep="\n")
    b = strip_boilerplate(
        split_lines(docs.repartition(7)), docs.repartition(3), frac=0.3, sep="\n"
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    by_id = {t[0]: t for t in ra}
    assert by_id[1][1] == "uniq 1" and by_id[1][3] == 2
    assert by_id[2][1] == "uniq 2" and by_id[2][3] == 0
