"""Iceberg-pattern snapshot log for the extract-job sink: file-manifest
snapshots + as-of (time-travel) reads.

The container ships no Iceberg runtime, so the job's sink is parquet
``partitionBy(part_id)`` + a per-bucket metrics manifest.  This module
adds the remaining Iceberg ingredient — a *snapshot log*: every wave
commit appends the wave's newly-written data files (path, length, bucket)
under a monotonically increasing ``snapshot_id``, and
:func:`read_snapshot` reconstructs the table AS OF any snapshot by
reading exactly the files committed up to it.  Appends from later runs
(resume waves, incremental loads) land under new snapshot ids, so readers
pinned to an old snapshot are isolated from concurrent appends — the same
reader/writer isolation contract an Iceberg snapshot gives.

Scale shape: a commit lists ONLY the wave's own bucket directories
(driver-side FS listing, same class of operation Spark's own file index
performs for any read) and appends the diff to the log via an anti-join —
no full-output relisting, no unbounded collect.  An as-of read collects
the file list for the chosen snapshot onto the driver; that list is the
same size as the file index Spark builds for any scan of those files.

Swapping this for real Iceberg is confined to the sink/read calls; the
job's bucket/manifest/resume logic is unchanged.  (No counterpart in the
reference repo — readability.php has no storage layer.)
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SNAPSHOT_LOG_SUFFIX = "_snapshots"


def _log_path(output_path: str) -> str:
    return output_path.rstrip("/") + SNAPSHOT_LOG_SUFFIX


def _list_parquet_files(spark: SparkSession, dir_path: str) -> list:
    """(path, length) of every parquet data file under ``dir_path`` —
    Hadoop FS API, so it works for file:/, hdfs:/, s3a:/ alike."""
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        f = st.getPath().toString()
        if f.endswith(".parquet"):
            out.append((f, int(st.getLen())))
    return out


def _read_log(spark: SparkSession, output_path: str) -> Optional[DataFrame]:
    from .pipeline import _try_read_parquet

    return _try_read_parquet(spark, _log_path(output_path))


def commit_snapshot(
    spark: SparkSession, output_path: str, part_ids: list
) -> int:
    """Append a snapshot covering the data files currently present in the
    given bucket directories that no earlier snapshot recorded.  Returns
    the new ``snapshot_id`` (or the current max if the wave added no new
    files — an empty snapshot is never written)."""
    base = output_path.rstrip("/")
    listed = []
    for pid in part_ids:
        for f, ln in _list_parquet_files(spark, f"{base}/part_id={pid}"):
            listed.append((f, ln, int(pid)))
    log = _read_log(spark, output_path)
    last = (
        0
        if log is None
        else (log.agg(F.max("snapshot_id")).first()[0] or 0)
    )
    if not listed:
        return last
    new_files = spark.createDataFrame(
        listed, "file string, length long, part_id int"
    )
    if log is not None:
        # anti-join on path: files already committed stay under their
        # original snapshot id (append-only sink; nothing is rewritten)
        new_files = new_files.join(log.select("file"), "file", "left_anti")
    sid = last + 1
    entry = new_files.select(
        F.lit(sid).alias("snapshot_id"),
        "file",
        "length",
        "part_id",
        F.current_timestamp().alias("committed_at"),
    )
    if entry.isEmpty():
        return last
    entry.coalesce(1).write.mode("append").parquet(_log_path(output_path))
    return sid


def snapshots(spark: SparkSession, output_path: str) -> DataFrame:
    """Snapshot history: (snapshot_id, n_files, bytes, committed_at)."""
    log = _read_log(spark, output_path)
    if log is None:
        raise ValueError(f"no snapshot log at {_log_path(output_path)}")
    return (
        log.groupBy("snapshot_id")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("length").alias("bytes"),
            F.max("committed_at").alias("committed_at"),
        )
        .orderBy("snapshot_id")
    )


def read_snapshot(
    spark: SparkSession,
    output_path: str,
    snapshot_id: Optional[int] = None,
) -> DataFrame:
    """The extract output AS OF ``snapshot_id`` (default: latest) — reads
    exactly the data files committed up to that snapshot, so later appends
    are invisible.  ``part_id`` is recovered from the log (the raw file
    read bypasses partition-directory inference)."""
    log = _read_log(spark, output_path)
    if log is None:
        raise ValueError(f"no snapshot log at {_log_path(output_path)}")
    if snapshot_id is None:
        snapshot_id = log.agg(F.max("snapshot_id")).first()[0]
    rows = (
        log.filter(F.col("snapshot_id") <= snapshot_id)
        .select("file", "part_id")
        .collect()
    )
    if not rows:
        raise ValueError(
            f"snapshot {snapshot_id} is empty or unknown at "
            f"{_log_path(output_path)}"
        )
    by_pid: dict = {}
    for r in rows:
        by_pid.setdefault(r["part_id"], []).append(r["file"])
    parts = []
    for pid, files in sorted(by_pid.items()):
        parts.append(
            spark.read.parquet(*files).withColumn(
                "part_id", F.lit(pid).cast("int")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
