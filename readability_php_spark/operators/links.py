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

#: An anchor tag's href value, either quote style.  Group 1 = double-quoted
#: value, group 2 = single-quoted.  [^>]* keeps the scan inside one tag.
_HREF_RE = r"""(?i)<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)')"""

#: host inside an absolute/protocol-relative URL: after the scheme-ish
#: prefix, up to the first /, ?, # or end; strips userinfo@ and :port.
_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//(?:[^/?#@]*@)?([^/?#:]+)"


def host_of(url_col) -> F.Column:
    """Lower-cased host of an absolute or protocol-relative URL column
    ('' when the value has no ``//host`` authority)."""
    return F.lower(F.regexp_extract(url_col, _HOST_RE, 1))


def extract_outlinks(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """One row per anchor: ``(src_host, dst_host, href)``.

    ``html_col`` may be binary (decoded UTF-8) or string.  Relative hrefs
    resolve to the source page's host; schemes without an authority
    (mailto:, javascript:, tel:) and fragment-only hrefs are dropped.
    """
    html = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        html = F.decode(html, "UTF-8")
    # regexp_extract_all only returns ONE group; normalize both quote
    # styles to double quotes first so group 1 always carries the value.
    canon = F.regexp_replace(
        html, r"""(?i)(<a\s[^>]*?href\s*=\s*)'([^']*)'""", '$1"$2"'
    )
    hrefs = F.regexp_extract_all(canon, F.lit(r"""(?i)<a\s[^>]*?href\s*=\s*"([^"]*)\""""), 1)
    out = pages.select(
        host_of(F.col(url_col)).alias("src_host"),
        F.explode(hrefs).alias("href"),
    )
    has_authority = F.col("href").rlike(_HOST_RE)
    # opaque scheme (mailto:, javascript:, tel:) = scheme prefix without //
    opaque = F.col("href").rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:") & ~has_authority
    fragment_only = F.col("href").startswith("#") | (F.col("href") == "")
    return out.filter(~opaque & ~fragment_only).select(
        "src_host",
        F.when(has_authority, host_of(F.col("href")))
        .otherwise(F.col("src_host"))
        .alias("dst_host"),
        "href",
    )


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
