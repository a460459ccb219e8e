"""Page-corpus sources.

The engine's input shape is the Common-Crawl-style table from BASELINE.json's
``input_hint``: ``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``.  Two deterministic generators (no external data, no RNG):

- ``fixture_corpus_rows`` — the reference's 89 golden pages replicated K
  times with URL rewriting; spans 1.2 KB–1.63 MB per doc, so it exercises the
  size-bucketing / skew paths. Used by tests and bench.
- ``documents_corpus_df`` — wraps /root/testdata ``documents.text`` rows in a
  fixed HTML template *inside Spark* (pure column ops, no UDF), giving an
  extraction corpus whose ground truth is the original ``text`` column —
  the basis of the DuckDB-oracle round-trip checks in __spark_entry__.py.
"""

from __future__ import annotations

import datetime
import os
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FIXTURE_DIR = "/root/reference/test/test-pages"

PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

# fixture → language (from the page content; used for lang-filter tests)
_FIXTURE_LANGS = {
    "lemonde-1": "fr", "liberation-1": "fr", "heise": "de", "infobae": "es",
    "pixnet": "zh", "gmw": "zh", "hukumusume": "ja", "rtl-1": "ar",
    "rtl-2": "ar", "rtl-3": "ar", "rtl-4": "ar", "herald-sun-1": "en",
}
_EPOCH = datetime.datetime(2024, 1, 1)


def fixture_corpus_rows(
    replicas: int = 1, fixture_dir: str = FIXTURE_DIR
) -> Iterator[tuple]:
    """Deterministic rows: each fixture replicated ``replicas`` times with
    rewritten URLs and a warc_ts derived from the row index (seed-free)."""
    cases = sorted(
        d for d in os.listdir(fixture_dir)
        if os.path.isdir(os.path.join(fixture_dir, d))
    )
    i = 0
    for k in range(replicas):
        for case in cases:
            with open(os.path.join(fixture_dir, case, "source.html"), "rb") as f:
                raw = f.read()
            yield (
                f"http://fakehost/{case}/{k}.html",
                _EPOCH + datetime.timedelta(seconds=i),
                raw,
                None,
                _FIXTURE_LANGS.get(case, "en"),
            )
            i += 1


def fixture_corpus_df(
    spark: SparkSession,
    replicas: int = 1,
    fixture_dir: str = FIXTURE_DIR,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """The fixture corpus as a DataFrame.  Replication happens SPARK-side:
    only the 89 base pages (~19 MB) transit the driver, and the ×replicas
    fan-out is a join against ``spark.range(replicas)`` with column-op
    url/timestamp rewrites — row-identical to :func:`fixture_corpus_rows`
    (differential-tested) but flat in driver memory, where the old
    materialize-all-rows path held replicas × 19 MB in the driver and JVM
    heap (a ×600 corpus OOM'd a 24 GB driver)."""
    cases = sorted(
        d for d in os.listdir(fixture_dir)
        if os.path.isdir(os.path.join(fixture_dir, d))
    )
    base_rows = []
    for ci, case in enumerate(cases):
        with open(os.path.join(fixture_dir, case, "source.html"), "rb") as f:
            raw = f.read()
        base_rows.append((case, ci, raw, _FIXTURE_LANGS.get(case, "en")))
    base = spark.createDataFrame(
        base_rows, "case string, case_idx int, html binary, lang string"
    )
    n_cases = len(cases)
    df = (
        base.crossJoin(spark.range(replicas).select(F.col("id").alias("k")))
        .select(
            F.concat(
                F.lit("http://fakehost/"), "case", F.lit("/"),
                F.col("k").cast("string"), F.lit(".html"),
            ).alias("url"),
            # row index i = k·n_cases + case_idx, matching the generator;
            # timestampadd over a naive timestamp literal stays identical
            # to the generator's naive datetimes in ANY session timezone
            F.expr(
                f"timestampadd(SECOND, k * {n_cases} + case_idx, "
                f"TIMESTAMP '{_EPOCH:%Y-%m-%d %H:%M:%S}')"
            ).alias("warc_ts"),
            "html",
            F.lit(None).cast("string").alias("text"),
            "lang",
        )
    )
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


#: Fixed page template applied to `documents` rows with pure column ops.
#: Paragraph split: the document text is broken on newline runs (\n+) into
#: <p> blocks inside an article div, surrounded by boilerplate the
#: extractor must strip (nav/header/footer/sidebar).
def documents_corpus_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id,text,lang,source,n_chars) → pages DataFrame, all
    JVM-side (concat/regexp only; no Python in the template path)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # escape &/</> so arbitrary text survives the HTML round trip, then break
    # paragraphs on newline runs
    escaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), r"&", "&amp;"), r"<", "&lt;"
        ),
        r">",
        "&gt;",
    )
    body_html = F.concat(
        F.lit("<p>"),
        F.regexp_replace(escaped, r"\n+", "</p><p>"),
        F.lit("</p>"),
    )
    html = F.concat(
        F.lit(
            "<!DOCTYPE html><html><head><title>Document "
        ),
        F.col("doc_id").cast("string"),
        F.lit(
            " - SynthCorp</title></head><body>"
            '<div class="header"><ul class="menu"><li><a href="/">Home</a></li>'
            '<li><a href="/about">About</a></li></ul></div>'
            '<div class="content"><div class="article-body">'
        ),
        body_html,
        F.lit(
            "</div></div>"
            '<div class="footer sidebar"><p>Copyright SynthCorp. All rights '
            "reserved. Contact us at example.</p></div></body></html>"
        ),
    )
    return docs.select(
        F.concat(F.lit("http://synth.test/doc/"), F.col("doc_id").cast("string"),
                 F.lit(".html")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet loader for the driver-generated tables (TESTDATA.md).

    Pins the session timezone to UTC (idempotent): parquet stores
    instants, Spark renders them in the SESSION timezone, and every
    DuckDB oracle compares naive-UTC wall clocks — without the pin, a
    harness running under TZ=America/New_York would shift every
    timestamp-bearing gate by the zone offset and fail correct code."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
