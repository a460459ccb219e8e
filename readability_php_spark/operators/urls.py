"""URL canonicalization + URL-level dedup — Common-Crawl preprocessing ops.

A crawl corpus carries the same page under fragment/tracking-param/port
variants; URL-level dedup is the cheapest dedup stage and runs before any
content hashing.  All pure ``pyspark.sql.functions`` column algebra (JVM
codegen, no UDF), with exact ANSI-SQL twins in the DuckDB oracle — the
regexes avoid lookarounds so RE2 (DuckDB) and Java regex agree.

Canonicalization steps (each a visible, separately-testable rewrite):
1. lowercase scheme + host (path stays case-sensitive);
2. strip the fragment (``#…``);
3. strip tracking params (``utm_*``, ``fbclid``, ``gclid``) wherever they
   sit in the query string, then tidy leftover ``?``/``&`` artifacts;
4. drop default ports (``:80`` for http, ``:443`` for https);
5. drop one trailing ``/`` from a non-root path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tracking params stripped during canonicalization — anchored to a
#: param boundary ([?&]) so 'xutm_source=..' (a different param), values
#: CONTAINING 'gclid=..', and path segments are never clipped; the
#: delimiter is kept ($1) and the ?&/&&/trailing tidy passes absorb it
_TRACKING = r"([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*"


def canonical_url(url: Column) -> Column:
    # 1. lowercase scheme://host[:port] (group 1), keep the rest (group 2)
    c = F.concat(
        F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1),
    )
    # fall back to the raw value for non-absolute urls
    c = F.when(c == "", url).otherwise(c)
    # 2. fragment off
    c = F.regexp_replace(c, r"#.*$", "")
    # 3. tracking params out, then tidy "?&", "&&", trailing "?"/"&"
    c = F.regexp_replace(c, _TRACKING, r"$1")
    c = F.regexp_replace(c, r"\?&+", "?")
    c = F.regexp_replace(c, r"&&+", "&")
    c = F.regexp_replace(c, r"[?&]+$", "")
    # 4. default ports
    c = F.regexp_replace(c, r"^(http://[^/:?#]*):80(/|\?|$)", r"$1$2")
    c = F.regexp_replace(c, r"^(https://[^/:?#]*):443(/|\?|$)", r"$1$2")
    # 5. one trailing slash off a non-root path
    c = F.regexp_replace(c, r"^([a-z][a-z0-9+.-]*://[^/]+/.+?)/$", r"$1")
    return c


def url_dedup(pages: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """(canonical_url, keeper id, group size) for groups of ≥2 URL variants.
    Keeper = lowest id (deterministic); one shuffle on the canonical key.
    At corpus scale this is the map-side-combined groupBy that precedes
    content-hash dedup."""
    canon = pages.select(
        F.col(id_col), canonical_url(F.col(url_col)).alias("canonical_url")
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_variants"),
        )
        .filter(F.col("n_variants") >= 2)
    )


def filter_blocked_domains(
    pages: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop pages whose registrable host appears in a blocklist table
    (domain-level spam/adult/SEO exclusion — the standard curation step
    before content-level filters).  Host extraction is pure regex; the
    blocklist is one column and small next to the corpus, so the anti-join
    broadcasts (AQE picks it automatically; at very large blocklists the
    join key is the host string — hash it to shrink shuffle width).

    Matches the host exactly AND by registrable suffix (sub.evil.test is
    blocked by evil.test)."""
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))
    with_host = pages.withColumn("_host", host)
    bl = blocklist.select(F.lower(F.col("domain")).alias("_bad")).distinct()
    # suffix match: host == domain OR host endswith '.' + domain
    joined = with_host.join(
        F.broadcast(bl),
        (F.col("_host") == F.col("_bad"))
        | F.col("_host").endswith(F.concat(F.lit("."), F.col("_bad"))),
        "left_anti",
    )
    return joined.drop("_host")


def cap_per_host(
    pages: DataFrame,
    k: int,
    url_col: str = "url",
    order_col: str = "doc_id",
) -> DataFrame:
    """Host-diversity cap: keep at most ``k`` documents per host, lowest
    ``order_col`` first (deterministic — rank by a quality score to keep
    the best instead).  Standard pretraining downsampling: without it a
    single template-heavy domain (forums, e-commerce listings) dominates
    the corpus.

    Scale shape: one window shuffle keyed on the host — and Catalyst
    plants a PARTIAL ``WindowGroupLimit`` below the exchange (verified in
    the physical plan), so every input task pre-trims to its own top-k
    per host before shuffling: a mega-host moves at most k rows per
    upstream task, not its millions of pages, and the final per-host task
    sees k x tasks rows worst-case."""
    from pyspark.sql.window import Window

    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    )
    w = Window.partitionBy("host").orderBy(order_col)
    return (
        pages.withColumn("host", host)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
