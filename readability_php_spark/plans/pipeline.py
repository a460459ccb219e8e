"""End-to-end extraction job: the north-rule pipeline.

    scan → (optional pre-filters, pushed down) → skew-salted repartition →
    size-ordered batching → mapInPandas(extract) → partitioned write +
    per-partition manifest/metrics → idempotent resume via anti-join.

Scale reasoning (explicitly, for the 1000-executor / 100 TB case):

- **Partition unit = `part_id = pmod(xxhash64(url, seed), N)`.**  Crawl data
  arrives clustered by host; hashing on url with a seed breaks host
  clustering so no executor gets all of one giant site.  N is chosen so a
  partition's HTML fits comfortably in one Python worker (~128-512 MB of
  raw HTML per partition at target scale).
- **Size-ordered batches.** `sortWithinPartitions(length(html))` makes every
  Arrow batch hold similarly-sized documents: `maxRecordsPerBatch` then
  bounds batch bytes tightly instead of mixing 1 KB and 2 MB docs (tail
  batches of huge docs are small in rows, equal in bytes). CPU-skew from
  pathological pages is bounded by the kernel's depth cap.
- **Resume = anti-join on the manifest.**  The manifest table holds one row
  per completed part_id with its metrics.  A restarted job reads it,
  anti-joins the input on part_id (a broadcast anti-join — the manifest is
  tiny), and overwrites only the partitions it recomputes
  (`partitionOverwriteMode=dynamic`), so a crashed run never produces
  duplicate or torn output.
- **All relational pieces stay in Catalyst**: the scan prunes to
  (url, html [, filters]), the pre-filters push to parquet/Iceberg, the
  manifest join broadcasts.  Only the kernel itself is Python, by design.

The sink here is parquet (this sandbox has no Iceberg runtime); the write
pattern (partitioned overwrite + manifest) is the Iceberg pattern —
swapping `.parquet(path)` for `.writeTo(table)` is the only change needed.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import Configuration
from ..operators.extract import extract_operator

#: Arrow batch size for multi-MB HTML rows. 10k-row default batches would be
#: 10 GB+ on crawl data; 64 rows × ~1 MB keeps worker RSS bounded.
ARROW_BATCH_FOR_HTML = 64


@dataclass
class ExtractJobResult:
    output_path: str
    manifest_path: str
    partitions_done: int
    partitions_skipped: int


def tune_session_for_extraction(spark: SparkSession) -> None:
    """Session knobs the operator relies on; idempotent."""
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_FOR_HTML)
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")


def salted_partitions(
    pages: DataFrame, num_partitions: int, seed: int = 42
) -> DataFrame:
    """Assign the stable work-unit id and lay data out by it.

    ``part_id`` is content-stable (url hash), NOT Spark's physical partition
    index — resume must survive a different cluster size, so the unit of
    completion tracking is the hash bucket, not the task."""
    with_id = pages.withColumn(
        "part_id",
        F.pmod(F.xxhash64(F.col("url"), F.lit(seed)), F.lit(num_partitions)).cast("int"),
    )
    # one shuffle: co-locate each work unit, then order by size within the
    # partition so Arrow batches are homogeneous in bytes
    return with_id.repartition(num_partitions, "part_id").sortWithinPartitions(
        F.length("html")
    )


def read_manifest(spark: SparkSession, manifest_path: str) -> Optional[DataFrame]:
    try:
        if not os.path.exists(manifest_path):
            return None
        return spark.read.parquet(manifest_path)
    except Exception:
        return None


def run_extract_job(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    *,
    config: Optional[Configuration] = None,
    num_partitions: int = 64,
    salt_seed: int = 42,
    manifest_path: Optional[str] = None,
    resume: bool = True,
    lang_filter: Optional[str] = None,
    max_html_bytes: Optional[int] = None,
) -> ExtractJobResult:
    """The flagship job.  ``pages``: DataFrame with (url, html[, lang...])."""
    tune_session_for_extraction(spark)
    manifest_path = manifest_path or output_path.rstrip("/") + "_manifest"

    # pre-filters: expressed declaratively so they push into the scan
    if lang_filter is not None:
        pages = pages.filter(F.col("lang") == lang_filter)
    if max_html_bytes is not None:
        pages = pages.filter(F.length("html") <= max_html_bytes)

    work = salted_partitions(pages, num_partitions, salt_seed)

    skipped = 0
    manifest = read_manifest(spark, manifest_path) if resume else None
    if manifest is not None:
        done_ids = manifest.select("part_id").distinct()
        skipped = done_ids.count()
        # broadcast anti-join: manifest is tiny (one row per work unit)
        work = work.join(F.broadcast(done_ids), "part_id", "left_anti")

    extracted = extract_operator(work, config)
    # carry the stable work-unit id for partitioned write + metrics.
    # part_id is recomputed (deterministic hash) rather than threaded through
    # the UDF — stays JVM-side and keeps the UDF schema stable.
    extracted = extracted.withColumn(
        "part_id",
        F.pmod(F.xxhash64(F.col("url"), F.lit(salt_seed)), F.lit(num_partitions)).cast("int"),
    )

    extracted.write.mode("overwrite").partitionBy("part_id").parquet(output_path)

    # per-partition lineage/metrics → manifest (append; readers distinct())
    out = spark.read.parquet(output_path)
    if manifest is not None:
        out = out.join(F.broadcast(manifest.select("part_id").distinct()),
                       "part_id", "left_anti")
    metrics = out.groupBy("part_id").agg(
        F.count("*").alias("docs"),
        F.sum("html_bytes").alias("bytes_in"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
        F.sum("attempts").alias("attempts_total"),
        F.sum("extract_ms").alias("extract_ms_total"),
        F.max("extract_ms").alias("extract_ms_max"),
        F.current_timestamp().alias("completed_at"),
    )
    metrics.write.mode("append").parquet(manifest_path)
    done = num_partitions - skipped

    return ExtractJobResult(
        output_path=output_path,
        manifest_path=manifest_path,
        partitions_done=done,
        partitions_skipped=skipped,
    )
