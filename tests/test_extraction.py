"""Byte-identity of vectorized extraction vs the pinned oracle
(BASELINE.json input_hint: 'byte-identical extracted text per url')."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pregel_spark.corpus import gen_pages, write_pages
from pregel_spark.extraction import (
    extract_links_pandas,
    extract_links_udf,
    extract_text_pandas,
    extract_text_udf,
    oracle_extract_links,
    oracle_extract_text,
)

ADVERSARIAL_CASES = [
    (b"", ""),
    (b"<p>plain</p>", "plain"),
    (b"<p>Fish &amp; chips &lt;b&gt; &#x2603; &#9731; a&nbsp;b &unknown; &#xZZ;</p>",
     "Fish & chips <b> ☃ ☃ a b &unknown; &#xZZ;"),
    (b"<script>var x='<a href=\"http://e.x/\">'</script><p>after</p>", "after"),
    (b"<style>a{x}</style>text", "text"),
    (b"<!-- c --><div>d</div>", "d"),
    ("déjà ☃ vu".encode(), "déjà ☃ vu"),
    (b"bad \xff\xfe bytes", "bad �� bytes"),
    # '<closed <i>' consumes up to the first '>' as one (malformed) tag
    (b"<div><p>nested <b>un<closed <i>tags</div>", "nested un tags"),
]


def test_oracle_text_golden():
    for html, want in ADVERSARIAL_CASES:
        assert oracle_extract_text(html) == want, html


def test_pandas_twin_matches_oracle_on_adversarial():
    s = pd.Series([h for h, _ in ADVERSARIAL_CASES])
    got = extract_text_pandas(s).tolist()
    want = [oracle_extract_text(h) for h, _ in ADVERSARIAL_CASES]
    assert got == want


def test_pandas_twin_matches_oracle_on_corpus():
    tbl = gen_pages(n_pages=300, n_sites=8, seed=42).to_pandas()
    got = extract_text_pandas(tbl["html"]).tolist()
    want = [oracle_extract_text(h) for h in tbl["html"]]
    assert got == want
    # corpus text column IS the oracle output
    assert tbl["text"].tolist() == want


def test_links_twin_matches_oracle():
    tbl = gen_pages(n_pages=300, n_sites=8, seed=42).to_pandas()
    got = extract_links_pandas(tbl["html"], tbl["url"]).tolist()
    want = [
        oracle_extract_links(h, u) for h, u in zip(tbl["html"], tbl["url"])
    ]
    assert got == want
    assert sum(len(x) for x in want) > 100  # the corpus really has links


def test_link_resolution_rules():
    html = (
        b"<a href='#frag'>a</a><a href='mailto:x@y'>b</a>"
        b"<a href=/rel/p>c</a><a href=\"http://h.x/q#s\">d</a>"
        b"<a href='ftp://z/'>e</a>"
    )
    got = oracle_extract_links(html, "http://base.example/dir/page")
    assert got == ["http://base.example/rel/p", "http://h.x/q"]


@pytest.mark.usefixtures("spark")
def test_spark_udf_byte_identity(spark, tmp_path):
    path = write_pages(str(tmp_path / "pages.parquet"), n_pages=300, seed=42)
    pages = spark.read.parquet(path)
    res = (
        pages.select(
            "url",
            "text",
            extract_text_udf(F.col("html")).alias("spark_text"),
            extract_links_udf(F.col("html"), F.col("url")).alias("spark_links"),
        )
        .collect()
    )
    tbl = gen_pages(n_pages=300, n_sites=8, seed=42).to_pandas()
    oracle_links = {
        u: oracle_extract_links(h, u) for u, h in zip(tbl["url"], tbl["html"])
    }
    for row in res:
        assert row["spark_text"] == row["text"], row["url"]
        assert list(row["spark_links"]) == oracle_links[row["url"]], row["url"]


# ------------------------- anchor-text extraction ----------------------

ANCHOR_CASES = [
    (b'<a href="http://t.example/a">Click <b>here</b></a>', "http://x.example/",
     [("http://t.example/a", "Click here")]),
    (b'<a href="http://t.example/a"></a>', "http://x.example/",
     [("http://t.example/a", "")]),
    # unclosed anchor yields no row (pinned); fragment-only href skipped
    (b'<a href="http://t.example/b">no close', "http://x.example/", []),
    (b'<a href="#frag">skip</a><a href=/rel/p>Rel &amp; Text</a>',
     "http://x.example/base/",
     [("http://x.example/rel/p", "Rel & Text")]),
    (b'<a href="mailto:a@b.c">mail</a>', "http://x.example/", []),
]


def test_oracle_anchors_golden():
    from pregel_spark.extraction import oracle_extract_anchors

    for html, base, want in ANCHOR_CASES:
        assert oracle_extract_anchors(html, base) == want, html


def test_anchors_pandas_twin_matches_oracle_on_corpus():
    from pregel_spark.extraction import (
        extract_anchors_pandas,
        oracle_extract_anchors,
    )

    tbl = gen_pages(n_pages=300, n_sites=8, seed=42).to_pandas()
    got = extract_anchors_pandas(tbl["html"], tbl["url"]).tolist()
    want = [
        [{"dst": d, "anchor": a} for d, a in oracle_extract_anchors(h, u)]
        for h, u in zip(tbl["html"], tbl["url"])
    ]
    assert got == want


def test_anchors_from_pages_and_index(spark, tmp_path):
    from pregel_spark.graph import anchor_index, anchors_from_pages

    p = write_pages(str(tmp_path / "pages.parquet"), n_pages=200, seed=7)
    pages = spark.read.parquet(p)
    links = anchors_from_pages(pages)
    rows = links.collect()
    assert rows, "no anchors extracted"
    # every row matches the per-document oracle
    from pregel_spark.extraction import oracle_extract_anchors

    pdf = pages.toPandas()
    want = set()
    for h, u in zip(pdf["html"], pdf["url"]):
        for d, a in oracle_extract_anchors(h, u):
            if d != u:
                want.add((u, d, a))
    assert {(r["src"], r["dst"], r["anchor"]) for r in rows} == want

    idx = anchor_index(links, top_k=2).collect()
    # python oracle for the aggregation
    from collections import Counter

    counts = {}
    for r in rows:
        for t in r["anchor"].lower().split(" "):
            if t:
                counts.setdefault(r["dst"], Counter())[t] += 1
    expect = set()
    for dst, c in counts.items():
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        for rank, (t, n) in enumerate(ordered, 1):
            expect.add((dst, t, n, rank))
    assert {(r["dst"], r["term"], r["n"], r["rank"]) for r in idx} == expect


# ------------------------- URL canonicalization -----------------------

TRICKY_URLS = [
    "HTTP://WWW.Example.COM:80/Path/To/Page?b=2&a=1#frag",
    "https://Example.com:443/",
    "https://example.com:8443/keep-port",
    "http://example.com",
    "http://example.com?z=9&utm_source=feed&UTM_campaign=x&a=1",
    "http://example.com/?",
    "http://example.com/p?&&b=2&&a=1&",
    "  http://padded.example.com/x  ",
    "ftp://files.example.org/pub",
    "mailto:someone@example.com",
    "not a url at all",
    "http://example.com/CaseSensitive/Path?Key=Value",
    "http://example.com/a/../b/./c",
    "http://example.com/percent%2Fencoded?q=%20x",
    "http://user@example.com:80/auth",
    "https://example.com/#",
    "http://example.com:80",
    "http://example.com/p?utm_source=only",
    "",
    None,
]


def test_canonical_url_python_oracle_golden():
    from pregel_spark.extraction import oracle_canonical_url

    got = [oracle_canonical_url(u) for u in TRICKY_URLS]
    assert got == [
        "http://www.example.com/Path/To/Page?a=1&b=2",
        "https://example.com/",
        "https://example.com:8443/keep-port",
        "http://example.com/",
        "http://example.com/?a=1&z=9",
        "http://example.com/",
        "http://example.com/p?a=1&b=2",
        "http://padded.example.com/x",
        None,
        None,
        None,
        "http://example.com/CaseSensitive/Path?Key=Value",
        "http://example.com/a/../b/./c",
        "http://example.com/percent%2Fencoded?q=%20x",
        "http://user@example.com/auth",
        "https://example.com/",
        "http://example.com/",
        "http://example.com/p",
        None,
        None,
    ]


def test_canonical_url_spark_matches_oracle(spark):
    from pregel_spark.extraction import canonical_url_col, oracle_canonical_url

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(TRICKY_URLS)], "i int, url string"
    )
    got = {
        r["i"]: r["curl"]
        for r in df.select("i", canonical_url_col("url").alias("curl")).collect()
    }
    for i, u in enumerate(TRICKY_URLS):
        assert got[i] == oracle_canonical_url(u), (i, u, got[i])


def test_canonical_url_duckdb_matches_oracle():
    import duckdb

    from pregel_spark.extraction import duckdb_canonical_url, oracle_canonical_url

    con = duckdb.connect()
    con.execute("CREATE TABLE urls (i INT, url VARCHAR)")
    con.executemany(
        "INSERT INTO urls VALUES (?, ?)", list(enumerate(TRICKY_URLS))
    )
    rows = con.execute(
        f"SELECT i, {duckdb_canonical_url('url')} AS curl FROM urls ORDER BY i"
    ).fetchall()
    for i, curl in rows:
        assert curl == oracle_canonical_url(TRICKY_URLS[i]), (i, TRICKY_URLS[i], curl)
