"""Deterministic synthetic Common-Crawl-style pages corpus.

Realizes the ``input_hint`` table shape ``pages(url string, warc_ts
timestamp, html binary, text string, lang string)`` at small scale for
tests and benchmarks — no external data, fixed seed, no wall-clock
(epoch pinned to 2024-01-01T00:00:00Z per FIXTURES.md).

The html embeds ``<a href=...>`` anchors realizing a seeded power-law
link graph (preferential attachment toward low page indices → hub skew,
exercising the salted-aggregation path). ~5% of documents are
adversarial: empty html, invalid UTF-8, entities, NBSP, nested/unclosed
tags, relative/fragment/mailto hrefs.

``text`` is the output of the pinned oracle extractor on ``html`` — the
per-url byte-identity target for the vectorized Arrow UDF
(tests/test_extraction.py).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .extraction import oracle_extract_text

EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)

_WORDS = (
    "graph link rank crawl page web node edge spark shuffle partition "
    "vertex message superstep barrier combine aggregate iterate converge "
    "data table column batch vector stream index hash join scan filter"
).split()


def page_url(i: int, n_sites: int) -> str:
    return f"http://site{i % n_sites}.example/p/{i}"


def _out_links(rng: np.random.Generator, i: int, n_pages: int) -> list[int]:
    """Seeded power-law out-links with preferential attachment to low
    indices (page 0..9 are hubs). Self-links excluded."""
    deg = min(int(rng.zipf(2.0)) + 1, 30)
    # mix: half preferential (low ids), half uniform
    targets: list[int] = []
    for _ in range(deg):
        if rng.random() < 0.5:
            t = int(rng.integers(0, max(1, min(10, n_pages))))
        else:
            t = int(rng.integers(0, n_pages))
        if t != i:
            targets.append(t)
    return targets


def _body_text(rng: np.random.Generator, n_words: int) -> str:
    idx = rng.integers(0, len(_WORDS), size=n_words)
    return " ".join(_WORDS[j] for j in idx)


_ADVERSARIAL = [
    b"",  # empty html
    b"<html><body>caf\xc3\xa9 then broken \xff\xfe bytes</body></html>",
    b"<p>Fish &amp; chips &lt;tag&gt; &#x2603; snow &#9731; and&nbsp;space"
    b" &unknown; &#xZZ; trailing</p>",
    b"<div><p>nested <b>un<closed <i>tags</div>",
    "<p>unicode éü☃ direct</p>".encode(),
    b"<a href='#frag'>frag only</a><a href='mailto:x@y.z'>mail</a>"
    b"<a href=\"javascript:void(0)\">js</a><p>no real links</p>",
    b"<a href=/relative/one>rel</a><a href=\"../up/two\">up</a>"
    b"<a href=\"p/three#sec\">fragged</a>",
    b"<script>var x = '<a href=\"http://evil.example/\">';</script>"
    b"<style>a{color:red}</style><p>after script</p>",
]


def gen_pages(
    n_pages: int = 200,
    n_sites: int = 8,
    seed: int = 42,
) -> pa.Table:
    """Build the pages table as a pyarrow Table (deterministic)."""
    rng = np.random.default_rng(seed)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    lang_cycle = ["en", "de", "ru", "fr"]
    for i in range(n_pages):
        url = page_url(i, n_sites)
        if i % 20 == 13:  # ~5% adversarial
            html = _ADVERSARIAL[(i // 20) % len(_ADVERSARIAL)]
            # keep link structure alive even on adversarial pages
            links = _out_links(rng, i, n_pages)
            anchors = "".join(
                f'<a href="{page_url(t, n_sites)}">x{t}</a> ' for t in links
            )
            html = html + anchors.encode()
        else:
            links = _out_links(rng, i, n_pages)
            anchors = "\n".join(
                f'<a href="{page_url(t, n_sites)}">link to {t}</a>'
                for t in links
            )
            body = _body_text(rng, int(rng.integers(30, 120)))
            html = (
                f"<html><head><title>Page {i}</title>"
                f"<style>p{{margin:0}}</style></head>"
                f"<body><h1>Page {i}</h1><p>{body}</p>{anchors}"
                f"<!-- comment {i} --></body></html>"
            ).encode()
        urls.append(url)
        tss.append(EPOCH + _dt.timedelta(seconds=i))
        htmls.append(html)
        texts.append(oracle_extract_text(html))
        langs.append(lang_cycle[i % 4])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages(path: str, n_pages: int = 200, n_sites: int = 8, seed: int = 42) -> str:
    """Write the pages corpus as a parquet file; returns the path."""
    pq.write_table(gen_pages(n_pages, n_sites, seed), path)
    return path
