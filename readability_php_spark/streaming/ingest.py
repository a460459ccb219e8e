"""Structured Streaming ingestion (optional mode — SURVEY.md §7).

The reference is batch-only (one ``parse()`` per document); streaming is new
Spark-native surface: a file-source stream of page rows (the micro-batch
stand-in for a WARC/Kafka feed) flows through the SAME ``mapInPandas``
extraction operator — the kernel does not know it's streaming — followed by
a watermarked tumbling-window quality rollup.

Scale notes:
- ``maxFilesPerTrigger`` bounds micro-batch size the way
  ``maxRecordsPerBatch`` bounds Arrow batches;
- the rollup is an incremental stateful agg keyed by (window, lang): state
  size is O(windows × langs), not O(docs);
- ``withWatermark`` ages state out for late crawl timestamps.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import Configuration
from ..operators.extract import extract_operator
from ..sources.pages import PAGES_SCHEMA


def read_page_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def streaming_extract(
    pages_stream: DataFrame, config: Optional[Configuration] = None
) -> DataFrame:
    """Same operator as batch — extraction is stateless per row."""
    return extract_operator(pages_stream, config)


def streaming_quality_rollup(
    pages_stream: DataFrame,
    config: Optional[Configuration] = None,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window rollup over the extraction output: docs,
    errors, mean extracted length per (event-time window, lang).  warc_ts
    and lang are carried through the extraction batch so the watermark
    applies to event time, and state ages out per window."""
    extracted = extract_operator(pages_stream, config, carry=("warc_ts", "lang"))
    return (
        extracted.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
            F.avg(F.length("extracted_text")).alias("avg_len"),
            F.sum("attempts").alias("attempts_total"),
        )
    )


def run_stream_to_parquet(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    config: Optional[Configuration] = None,
    available_now: bool = True,
):
    """End-to-end streaming job: file stream → extract → parquet sink with
    exactly-once checkpointing.  ``available_now=True`` drains the existing
    backlog and stops (the testable mode); False runs continuously."""
    stream = read_page_stream(spark, source_dir)
    extracted = streaming_extract(stream, config)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return query


def streaming_url_dedup(
    pages: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Stateful streaming URL dedup: a crawl feed re-fetches the same url
    across micro-batches (recrawls, redirect chains, politeness retries);
    this keeps the first arrival of each url and drops the rest, with the
    dedup state AGED OUT by the watermark — the unbounded-state trap of a
    naive ``dropDuplicates(["url"])`` on an infinite stream is exactly
    what ``dropDuplicatesWithinWatermark`` exists to avoid: state is
    O(urls per watermark horizon), not O(urls ever seen).

    Composes before ``streaming_extract`` so a re-fetched page is never
    re-extracted (extraction is the expensive stage)."""
    return pages.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )
