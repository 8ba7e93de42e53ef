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
