"""Outlink extraction: crawl HTML → host-level link graph.

The reference resolves in-article URLs per document
(`/root/reference/src/Readability.php` postProcessContent — href/src
absolutization against the page URL); this module is the corpus-level
counterpart: pull every anchor from the RAW crawl HTML (link-graph
construction runs on the full page — nav/footer links are votes too —
not on the cleaned article), resolve each href to a destination host,
and aggregate (src_host, dst_host) edges that feed
:func:`readability_php_spark.operators.graph.pagerank`.

Scale shape: everything is JVM column algebra — ``regexp_extract_all``
over the decoded page, one explode, one map-side-combined edge count.
No Python touches the hot path; the page body is dropped at the explode
(only hrefs survive), so the edge aggregation shuffles ~bytes-per-link,
not bytes-per-page.

Href coverage is the deterministic core, not a browser URL parser:
double- or single-quoted ``href`` attributes; absolute
``http(s)://host/...``, protocol-relative ``//host/...``, and
root/path-relative hrefs (resolved to the source host).  ``mailto:``,
``javascript:``, and fragment-only hrefs are dropped.  Hosts are
lower-cased; ports and userinfo are stripped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: host inside an absolute/protocol-relative URL: after the scheme-ish
#: prefix, up to the first /, ?, # or end; strips userinfo@ and :port.
_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//(?:[^/?#@]*@)?([^/?#:]+)"


def host_of(url_col) -> F.Column:
    """Lower-cased host of an absolute or protocol-relative URL column
    ('' when the value has no ``//host`` authority)."""
    return F.lower(F.regexp_extract(url_col, _HOST_RE, 1))


def _canon_html(pages: DataFrame, html_col: str) -> F.Column:
    """Decoded page with single-quoted hrefs normalized to double quotes
    (regexp_extract_all returns one group, so both quote styles must land
    in the same one)."""
    html = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        html = F.decode(html, "UTF-8")
    return F.regexp_replace(
        html, r"""(?i)(<a\s[^>]*?href\s*=\s*)'([^']*)'""", '$1"$2"'
    )


def _keep_and_resolve(df: DataFrame) -> DataFrame:
    """Filter out opaque-scheme/fragment/empty hrefs and resolve the rest
    to a destination host (relative hrefs → the source page's host).
    Expects columns ``src_host`` and ``href``; adds ``dst_host``."""
    has_authority = F.col("href").rlike(_HOST_RE)
    # opaque scheme (mailto:, javascript:, tel:) = scheme prefix without //
    opaque = F.col("href").rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:") & ~has_authority
    fragment_only = F.col("href").startswith("#") | (F.col("href") == "")
    return df.filter(~opaque & ~fragment_only).withColumn(
        "dst_host",
        F.when(has_authority, host_of(F.col("href"))).otherwise(F.col("src_host")),
    )


def extract_outlinks(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """One row per anchor: ``(src_host, dst_host, href)``.

    ``html_col`` may be binary (decoded UTF-8) or string.  Relative hrefs
    resolve to the source page's host; schemes without an authority
    (mailto:, javascript:, tel:) and fragment-only hrefs are dropped.
    """
    hrefs = F.regexp_extract_all(
        _canon_html(pages, html_col),
        F.lit(r"""(?i)<a\s[^>]*?href\s*=\s*"([^"]*)\""""),
        1,
    )
    out = pages.select(
        host_of(F.col(url_col)).alias("src_host"),
        F.explode(hrefs).alias("href"),
    )
    return _keep_and_resolve(out).select("src_host", "dst_host", "href")


def host_link_graph(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    drop_self_loops: bool = True,
) -> DataFrame:
    """Aggregated host graph ``(src_host, dst_host, n_links)`` — the input
    :func:`readability_php_spark.operators.graph.pagerank` expects (feed
    it the edge list re-expanded or pass n_links as multiplicity by
    exploding; pagerank counts duplicate edges with multiplicity)."""
    edges = extract_outlinks(pages, html_col, url_col)
    if drop_self_loops:
        edges = edges.filter(F.col("src_host") != F.col("dst_host"))
    return edges.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )


#: A complete anchor element (href already quote-normalized): group 1 is
#: the whole <a ...>...</a> snippet, so href and inner text stay paired.
_ANCHOR_SNIPPET_RE = r"""(?is)(<a\s[^>]*?href\s*=\s*"[^"]*"[^>]*>.*?</a>)"""


def anchor_texts(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """One row per anchor with visible text: ``(src_host, dst_host,
    anchor_text)`` — the link-text corpus construction step (anchor text
    describing the TARGET page is classic weak supervision for retrieval /
    query-generation training data, and a quality prior for the target
    host).

    Pairing is by whole-anchor snippet extraction (one regex group =
    one ``<a …>…</a>`` element), so href and text can never misalign the
    way two independent extract-all passes could.  Inner markup is
    stripped, whitespace collapsed; anchors with no visible text (image
    links) are dropped.  Same href hygiene as :func:`extract_outlinks`.

    Scale shape: identical to extract_outlinks — regexp + explode column
    algebra, the page body is dropped at the explode, downstream
    aggregation shuffles only (host, text) pairs."""
    snippets = F.regexp_extract_all(
        _canon_html(pages, html_col), F.lit(_ANCHOR_SNIPPET_RE), 1
    )
    per_anchor = pages.select(
        host_of(F.col(url_col)).alias("src_host"),
        F.explode(snippets).alias("snippet"),
    ).select(
        "src_host",
        F.regexp_extract(
            F.col("snippet"), r"""(?i)<a\s[^>]*?href\s*=\s*"([^"]*)\"""", 1
        ).alias("href"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("snippet"), r"(?s)<[^>]*>", " "),
                r"\s+",
                " ",
            )
        ).alias("anchor_text"),
    )
    return (
        _keep_and_resolve(per_anchor)
        .filter(F.col("anchor_text") != "")
        .select("src_host", "dst_host", "anchor_text")
    )
