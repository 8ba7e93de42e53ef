"""HTML text/link extraction: pinned pure-Python oracle + vectorized twin.

The reference engine's only ingestion surface is a sectioned text-file
loader (``pregel/loader.lua:58-130``); the north rule replaces it with
extraction from Common-Crawl-style pages ``(url, warc_ts, html, text,
lang)``. Per ``BASELINE.json input_hint`` the Spark-side extraction must
be a vectorized pandas/Arrow UDF whose extracted text is byte-identical,
per url, to a pinned pure-Python oracle.

Both implementations share the same compiled regex *constants* but walk
different execution paths (per-string ``re`` calls vs pandas ``.str``
vectorized ops); ``tests/test_extraction.py`` asserts byte-identity over
the synthetic corpus including adversarial documents.

Extraction semantics (pinned — do not change without updating goldens):
1. bytes -> str via UTF-8 with ``errors='replace'``
2. drop ``<script>``/``<style>`` elements and HTML comments
3. replace every remaining tag with a single space
4. decode entities: named subset + decimal/hex numeric
5. collapse Unicode whitespace runs to one space, strip ends
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

# --- pinned regex constants (shared by oracle and vectorized twin) ---
SCRIPT_STYLE_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
TAG_RE = re.compile(r"(?s)<[^>]*>")
WS_RE = re.compile(r"\s+")
ENTITY_RE = re.compile(r"&(#x[0-9a-fA-F]+|#[0-9]+|[a-zA-Z][a-zA-Z0-9]*);")
HREF_RE = re.compile(
    r"(?is)<a\s[^>]*?href\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"']+))"
)
# href + the anchor's inner text (non-greedy to the matching </a>);
# anchors with no closing tag yield no row — pinned semantics
ANCHOR_RE = re.compile(
    r"(?is)<a\s[^>]*?href\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"']+))"
    r"[^>]*>(.*?)</a\s*>"
)

NAMED_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": "\xa0",
    "mdash": "—",
    "ndash": "–",
    "hellip": "…",
    "copy": "©",
}

_SKIP_SCHEMES = ("mailto:", "javascript:", "tel:", "data:")


def _entity_repl(m: re.Match) -> str:
    body = m.group(1)
    if body.startswith("#x") or body.startswith("#X"):
        try:
            cp = int(body[2:], 16)
            return chr(cp) if 0 < cp <= 0x10FFFF else m.group(0)
        except (ValueError, OverflowError):
            return m.group(0)
    if body.startswith("#"):
        try:
            cp = int(body[1:])
            return chr(cp) if 0 < cp <= 0x10FFFF else m.group(0)
        except (ValueError, OverflowError):
            return m.group(0)
    return NAMED_ENTITIES.get(body, m.group(0))


def decode_html(html: bytes | str | None) -> str:
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        return bytes(html).decode("utf-8", errors="replace")
    return str(html)


# ---------------------------------------------------------------------
# Oracle tier: pure Python, one document at a time (the pinned target).
# ---------------------------------------------------------------------

def oracle_extract_text(html: bytes | str | None) -> str:
    """Pinned per-document text extraction (the byte-identity target)."""
    s = decode_html(html)
    s = SCRIPT_STYLE_RE.sub(" ", s)
    s = COMMENT_RE.sub(" ", s)
    s = TAG_RE.sub(" ", s)
    s = ENTITY_RE.sub(_entity_repl, s)
    s = WS_RE.sub(" ", s).strip()
    return s


def _resolve_href(href: str, base_url: str) -> str | None:
    href = href.strip()
    if not href or href.startswith("#"):
        return None
    low = href.lower()
    if any(low.startswith(p) for p in _SKIP_SCHEMES):
        return None
    try:
        absu = urljoin(base_url, href)
    except ValueError:
        return None
    absu = absu.split("#", 1)[0]
    if not (absu.startswith("http://") or absu.startswith("https://")):
        return None
    return absu or None


def oracle_extract_links(html: bytes | str | None, base_url: str) -> list[str]:
    """Pinned per-document out-link extraction (absolute, fragment-free,
    http(s) only, duplicates preserved in document order)."""
    s = decode_html(html)
    s = SCRIPT_STYLE_RE.sub(" ", s)
    s = COMMENT_RE.sub(" ", s)
    out: list[str] = []
    for m in HREF_RE.finditer(s):
        href = m.group(1) or m.group(2) or m.group(3) or ""
        r = _resolve_href(href, base_url)
        if r is not None:
            out.append(r)
    return out


def _clean_anchor_text(s: str) -> str:
    """Anchor inner text through the SAME pinned text pipeline (tags ->
    space, entities, whitespace collapse) minus script/comment removal,
    which already happened on the enclosing document."""
    s = TAG_RE.sub(" ", s)
    s = ENTITY_RE.sub(_entity_repl, s)
    return WS_RE.sub(" ", s).strip()


def oracle_extract_anchors(
    html: bytes | str | None, base_url: str
) -> list[tuple[str, str]]:
    """Pinned per-document (target_url, anchor_text) extraction — the
    classic web-ranking signal (anchor text describes the TARGET).
    Same href resolution as :func:`oracle_extract_links`; duplicates
    preserved in document order; empty anchor text kept as ''."""
    s = decode_html(html)
    s = SCRIPT_STYLE_RE.sub(" ", s)
    s = COMMENT_RE.sub(" ", s)
    out: list[tuple[str, str]] = []
    for m in ANCHOR_RE.finditer(s):
        href = m.group(1) or m.group(2) or m.group(3) or ""
        r = _resolve_href(href, base_url)
        if r is not None:
            out.append((r, _clean_anchor_text(m.group(4) or "")))
    return out


# ---------------------------------------------------------------------
# Vectorized tier: pandas .str ops over Arrow batches (the fast twin).
# ---------------------------------------------------------------------

def _decode_series(html: pd.Series) -> pd.Series:
    return html.map(decode_html)


def extract_text_pandas(html: pd.Series) -> pd.Series:
    """Vectorized twin of :func:`oracle_extract_text` over a batch."""
    s = _decode_series(html)
    s = s.str.replace(SCRIPT_STYLE_RE, " ", regex=True)
    s = s.str.replace(COMMENT_RE, " ", regex=True)
    s = s.str.replace(TAG_RE, " ", regex=True)
    s = s.str.replace(ENTITY_RE, _entity_repl, regex=True)
    s = s.str.replace(WS_RE, " ", regex=True).str.strip()
    return s


def extract_links_pandas(html: pd.Series, url: pd.Series) -> pd.Series:
    """Vectorized twin of :func:`oracle_extract_links` over a batch."""
    s = _decode_series(html)
    s = s.str.replace(SCRIPT_STYLE_RE, " ", regex=True)
    s = s.str.replace(COMMENT_RE, " ", regex=True)
    raw = s.str.findall(HREF_RE)

    def _resolve_row(pair: tuple[list, str]) -> list[str]:
        matches, base = pair
        out = []
        for g1, g2, g3 in matches:
            r = _resolve_href(g1 or g2 or g3 or "", base)
            if r is not None:
                out.append(r)
        return out

    return pd.Series(
        [_resolve_row(p) for p in zip(raw.tolist(), url.tolist())],
        index=html.index,
    )


def extract_anchors_pandas(html: pd.Series, url: pd.Series) -> pd.Series:
    """Vectorized twin of :func:`oracle_extract_anchors` over a batch."""
    s = _decode_series(html)
    s = s.str.replace(SCRIPT_STYLE_RE, " ", regex=True)
    s = s.str.replace(COMMENT_RE, " ", regex=True)
    raw = s.str.findall(ANCHOR_RE)

    def _resolve_row(pair: tuple[list, str]) -> list[dict]:
        matches, base = pair
        out = []
        for g1, g2, g3, text in matches:
            r = _resolve_href(g1 or g2 or g3 or "", base)
            if r is not None:
                out.append({"dst": r, "anchor": _clean_anchor_text(text or "")})
        return out

    return pd.Series(
        [_resolve_row(p) for p in zip(raw.tolist(), url.tolist())],
        index=html.index,
    )


# Spark-facing pandas UDFs (Arrow batch transfer, no per-row Python UDF).
extract_text_udf = F.pandas_udf(extract_text_pandas, StringType())
extract_links_udf = F.pandas_udf(extract_links_pandas, ArrayType(StringType()))
extract_anchors_udf = F.pandas_udf(
    extract_anchors_pandas,
    ArrayType(
        StructType(
            [
                StructField("dst", StringType()),
                StructField("anchor", StringType()),
            ]
        )
    ),
)


# ------------------------- URL canonicalization -----------------------
#
# Crawl-dedup canonicalization of http(s) URLs, 100% native columns (no
# Python row path) with a pinned pure-Python oracle and a DuckDB SQL
# twin so the driver contract can verify it value-exactly. The
# reference has no URL layer (its loader reads opaque vertex names,
# pregel/loader.lua:58-130); this is north-rule webtext surface.
#
# Canonical form (pinned — all three implementations must agree):
#   1. trim outer spaces (what trim() means on both engines); drop the
#      fragment (first '#' onward)
#   2. scheme and authority lowercased (path/query case preserved;
#      userinfo, if any, is lowercased with the authority — documented
#      simplification, crawl URLs carry no credentials)
#   3. default port stripped (':80' for http, ':443' for https)
#   4. empty path -> '/'
#   5. query: split on '&', drop empty params and tracking params whose
#      key starts with 'utm_' (case-insensitive), byte-sort the rest,
#      rejoin; no surviving params -> no '?'
#   6. anything that is not http(s)://... -> NULL (non-web scheme or
#      unparseable); NULL in -> NULL out
#   No percent-encoding or dot-segment normalization: '%2F' vs '/' and
#   '/a/../b' are preserved verbatim (a crawl dedups on the exact bytes
#   it would re-fetch).

_URL_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_URL_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_URL_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([\s\S]*)$"
_URL_QUERY_RE = r"^[^?]*[?]([\s\S]*)$"


def canonical_url_col(url: "F.Column | str"):
    """Canonical URL as a native column expression (Catalyst codegen,
    no UDF): regexp split into scheme/authority/rest, conditional port
    strip, and a sort of the filtered query-param array."""
    u = F.substring_index(F.trim(url), "#", 1)
    scheme = F.lower(F.regexp_extract(u, _URL_SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _URL_AUTH_RE, 1))
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    rest = F.regexp_extract(u, _URL_REST_RE, 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, _URL_QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != F.lit("")) & ~F.lower(x).startswith("utm_"),
        )
    )
    qc = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(qc == "", F.lit("")).otherwise(F.concat(F.lit("?"), qc)),
    )
    return F.when(scheme.isin("http", "https"), canon).otherwise(
        F.lit(None).cast("string")
    )


def oracle_canonical_url(u: str | None) -> str | None:
    """Pinned pure-Python spec of :func:`canonical_url_col` (the golden
    tests assert byte-identity per url, mirroring the extraction
    invariant)."""
    if u is None:
        return None
    # strip(' ') not strip(): Spark/DuckDB trim() remove spaces only
    u = u.strip(" ").split("#", 1)[0]
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([\s\S]*)$", u)
    if m is None:
        return None
    scheme, auth = m.group(1).lower(), m.group(2).lower()
    if scheme not in ("http", "https"):
        return None
    auth = re.sub(":80$" if scheme == "http" else ":443$", "", auth)
    rest = m.group(3)
    path, _, query = rest.partition("?")
    if path == "":
        path = "/"
    params = sorted(
        p for p in query.split("&") if p != "" and not p.lower().startswith("utm_")
    )
    return scheme + "://" + auth + path + ("?" + "&".join(params) if params else "")


def duckdb_canonical_url(x: str) -> str:
    """DuckDB SQL expression computing the same canonical form of URL
    expression ``x`` — the driver-contract oracle twin (same pattern as
    ``pipeline.hashing.DUCKDB_HASH60``)."""
    u = f"split_part(trim({x}), '#', 1)"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    auth_raw = f"lower(regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    auth = (
        f"(CASE WHEN {scheme} = 'http' THEN regexp_replace({auth_raw}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({auth_raw}, ':443$', '') "
        f"ELSE {auth_raw} END)"
    )
    rest = (
        f"regexp_extract({u}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([\\s\\S]*)$', 1)"
    )
    path = f"(CASE WHEN regexp_extract({rest}, '^([^?]*)', 1) = '' THEN '/' ELSE regexp_extract({rest}, '^([^?]*)', 1) END)"
    query = f"regexp_extract({rest}, '^[^?]*[?]([\\s\\S]*)$', 1)"
    qc = (
        f"coalesce(array_to_string(list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT starts_with(lower(p), 'utm_'))), '&'), '')"
    )
    return (
        f"(CASE WHEN {scheme} IN ('http', 'https') THEN "
        f"{scheme} || '://' || {auth} || {path} || "
        f"(CASE WHEN {qc} = '' THEN '' ELSE '?' || {qc} END) "
        f"ELSE NULL END)"
    )
