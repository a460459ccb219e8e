"""Iceberg-pattern snapshot log for the extract-job sink: file-manifest
snapshots, as-of (time-travel) reads, small-file compaction, and snapshot
expiry (vacuum).

The container ships no Iceberg runtime, so the job's sink is parquet
``partitionBy(part_id)`` + a per-bucket metrics manifest.  This module
adds the remaining Iceberg ingredients:

- **snapshot log** — every wave commit appends the wave's newly-written
  data files (path, length, bucket) as ``op='add'`` rows under a
  monotonically increasing ``snapshot_id``;
- **as-of reads** — :func:`read_snapshot` reconstructs the table AS OF
  any snapshot by reading exactly the files live at it (adds minus
  removes), so readers pinned to a snapshot are isolated from concurrent
  appends, reruns, and compactions;
- **compaction** — :func:`compact_snapshots` bin-packs a bucket's many
  small files into few large ones and commits the rewrite as a new
  snapshot (``add`` rows for the new files, ``remove`` rows for the old);
  the old files stay on disk so older snapshots remain readable;
- **vacuum** — :func:`vacuum_snapshots` physically deletes files that no
  retained snapshot references (removed at or before the retention
  horizon), the ``expire_snapshots`` maintenance op.

Compacted rewrites land under the ``_compacted`` staging directory
(underscore-prefixed, so directory-listing readers skip it): a raw
``spark.read.parquet(output)`` keeps seeing exactly the original
append-only files — never a doubled bucket — while snapshot readers,
which address files by explicit path, see whichever generation their
snapshot references.  The staging split is also what makes compaction
crash-safe: a compaction that dies before its log append leaves orphans
only in ``_compacted``, where ``commit_snapshot`` (which lists only
``part_id=*`` directories) can never mistake them for new data.

Scale shape: a commit lists ONLY the affected bucket directories
(driver-side FS listing, the same class of operation Spark's own file
index performs for any read) and appends the diff to the log via an
anti-join — no full-output relisting, no unbounded collect.  An as-of
read collects the chosen snapshot's file list onto the driver; that list
is the same size as the file index Spark builds for any scan of those
files.

Swapping this for real Iceberg is confined to the sink/read calls; the
job's bucket/manifest/resume logic is unchanged.  (No counterpart in the
reference repo — readability.php has no storage layer.)
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SNAPSHOT_LOG_SUFFIX = "_snapshots"

#: staging prefix for compaction rewrites: an UNDERSCORE directory, so (a)
#: raw `spark.read.parquet(output)` readers never see compacted copies
#: (Spark/Hadoop listing skips _-prefixed directories, like _SUCCESS), and
#: (b) `commit_snapshot` — which lists only part_id=* directories — can
#: never re-add orphaned files from a compaction that crashed before its
#: log append.  Snapshot reads address files by explicit path, so the
#: staging location is invisible to them too.
COMPACTED_DIR = "_compacted"


def _log_path(output_path: str) -> str:
    return output_path.rstrip("/") + SNAPSHOT_LOG_SUFFIX


def _fs(spark: SparkSession, any_path: str):
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(any_path)
    return jvm, p.getFileSystem(conf)


def _list_parquet_files(spark: SparkSession, dir_path: str) -> list:
    """(path, length) of every parquet data file under ``dir_path`` —
    Hadoop FS API, so it works for file:/, hdfs:/, s3a:/ alike."""
    jvm, fs = _fs(spark, dir_path)
    p = jvm.org.apache.hadoop.fs.Path(dir_path)
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


def _require_log(spark: SparkSession, output_path: str) -> DataFrame:
    log = _read_log(spark, output_path)
    if log is None:
        raise ValueError(f"no snapshot log at {_log_path(output_path)}")
    return log


def _append_entries(spark, output_path: str, sid: int, rows: DataFrame) -> None:
    rows.select(
        F.lit(sid).cast("long").alias("snapshot_id"),
        "op",
        "file",
        "length",
        "part_id",
        F.current_timestamp().alias("committed_at"),
    ).coalesce(1).write.mode("append").parquet(_log_path(output_path))


def _last_sid(log: Optional[DataFrame]) -> int:
    if log is None:
        return 0
    return log.agg(F.max("snapshot_id")).first()[0] or 0


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
    last = _last_sid(log)
    if not listed:
        return last
    new_files = spark.createDataFrame(
        listed, "file string, length long, part_id int"
    )
    if log is not None:
        # anti-join on path: files already committed stay under their
        # original snapshot id (append-only sink; nothing is rewritten)
        new_files = new_files.join(log.select("file"), "file", "left_anti")
    if new_files.isEmpty():
        return last
    sid = last + 1
    _append_entries(
        spark, output_path, sid, new_files.withColumn("op", F.lit("add"))
    )
    return sid


def _live_files(log: DataFrame, snapshot_id: int) -> DataFrame:
    """Files visible AS OF ``snapshot_id``: added at ≤ sid, not removed at
    ≤ sid."""
    upto = log.filter(F.col("snapshot_id") <= snapshot_id)
    adds = upto.filter(F.col("op") == "add").select("file", "length", "part_id")
    removes = upto.filter(F.col("op") == "remove").select("file")
    return adds.join(removes, "file", "left_anti")


def snapshots(spark: SparkSession, output_path: str) -> DataFrame:
    """Snapshot history: (snapshot_id, adds, removes, bytes_added,
    committed_at)."""
    log = _require_log(spark, output_path)
    return (
        log.groupBy("snapshot_id")
        .agg(
            F.count(F.when(F.col("op") == "add", 1)).alias("adds"),
            F.count(F.when(F.col("op") == "remove", 1)).alias("removes"),
            F.sum(F.when(F.col("op") == "add", F.col("length"))).alias(
                "bytes_added"
            ),
            F.max("committed_at").alias("committed_at"),
        )
        .orderBy("snapshot_id")
    )


def _read_file_rows(spark: SparkSession, rows: list) -> Optional[DataFrame]:
    """One DataFrame over (file, part_id) rows: a scan per bucket, union
    across buckets (``part_id`` is re-attached from the log — compacted
    files live under a staging dir, so partition-directory inference with
    a shared basePath cannot recover it).  Plan depth is one Union node
    per bucket — bounded by ``num_buckets``, which the job keeps at a few
    hundred."""
    if not rows:
        return None
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


def read_snapshot(
    spark: SparkSession,
    output_path: str,
    snapshot_id: Optional[int] = None,
) -> DataFrame:
    """The extract output AS OF ``snapshot_id`` (default: latest) — reads
    exactly the data files live at that snapshot, so later appends and
    compactions are invisible.  ``part_id`` is recovered from the log
    (the raw file read bypasses partition-directory inference)."""
    log = _require_log(spark, output_path)
    last = _last_sid(log)
    if snapshot_id is None:
        snapshot_id = last
    elif snapshot_id > last or snapshot_id < 1:
        # an id the log never issued must fail LOUDLY: silently serving
        # the moving latest view to a reader pinning a stale/foreign id
        # would defeat the isolation the snapshot contract promises
        raise ValueError(
            f"unknown snapshot_id {snapshot_id}: log at "
            f"{_log_path(output_path)} has snapshots 1..{last}"
        )
    rows = _live_files(log, snapshot_id).select("file", "part_id").collect()
    out = _read_file_rows(spark, rows)
    if out is None:
        raise ValueError(
            f"snapshot {snapshot_id} is empty or unknown at "
            f"{_log_path(output_path)}"
        )
    return out


def diff_snapshots(
    spark: SparkSession,
    output_path: str,
    from_snapshot: int,
    to_snapshot: Optional[int] = None,
    key_col: str = "url",
) -> DataFrame:
    """Row-level change feed between two snapshots: rows live as of
    ``to_snapshot`` but not ``from_snapshot`` come back with
    ``change='added'``, the reverse with ``change='removed'`` — the
    incremental-consumption pattern (a downstream pipeline processes the
    delta, not the table).

    File-granular under the hood: only files whose MEMBERSHIP changed
    between the snapshots are read, so the cost scales with the delta.
    A compaction rewrites files without changing rows; the key-level
    anti-join between the two file sets cancels that noise, so a pure
    compaction diffs to zero rows."""
    log = _require_log(spark, output_path)
    last = _last_sid(log)
    if to_snapshot is None:
        to_snapshot = last
    if not (0 <= from_snapshot <= last) or not (1 <= to_snapshot <= last):
        raise ValueError(
            f"unknown snapshot range {from_snapshot}..{to_snapshot}: log at "
            f"{_log_path(output_path)} has snapshots 1..{last} "
            "(from_snapshot=0 means 'since the beginning')"
        )
    a = _live_files(log, from_snapshot).select("file", "part_id")
    b = _live_files(log, to_snapshot).select("file", "part_id")
    gained = b.join(a.select("file"), "file", "left_anti").collect()
    lost = a.join(b.select("file"), "file", "left_anti").collect()
    gained_rows = _read_file_rows(spark, gained)
    lost_rows = _read_file_rows(spark, lost)
    if gained_rows is None and lost_rows is None:
        # steady state: nothing changed between the snapshots — an EMPTY
        # change feed, not an error (schedulers poll this on every tick)
        return (
            read_snapshot(spark, output_path, to_snapshot)
            .limit(0)
            .withColumn("change", F.lit("added"))
        )
    if gained_rows is None:
        return lost_rows.withColumn("change", F.lit("removed"))
    if lost_rows is None:
        return gained_rows.withColumn("change", F.lit("added"))
    added = gained_rows.join(
        lost_rows.select(key_col), key_col, "left_anti"
    ).withColumn("change", F.lit("added"))
    removed = lost_rows.join(
        gained_rows.select(key_col), key_col, "left_anti"
    ).withColumn("change", F.lit("removed"))
    return added.unionByName(removed)


def compact_snapshots(
    spark: SparkSession,
    output_path: str,
    part_ids: Optional[list] = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> int:
    """Small-file compaction: for each chosen bucket whose latest-snapshot
    view has ≥ ``min_files`` data files, rewrite them into
    ``ceil(bytes/target)`` larger files and commit the rewrite as ONE new
    snapshot (adds + removes).  Old files stay on disk so earlier
    snapshots remain readable until :func:`vacuum_snapshots`.  Returns the
    new snapshot id (current max if nothing qualified).

    Scale shape: one job per bucket reading only that bucket's live files
    and writing ``coalesce(k)`` output — no shuffle; buckets compact
    independently, so a maintenance scheduler can spread them over time."""
    log = _require_log(spark, output_path)
    last = _last_sid(log)
    base = output_path.rstrip("/")
    live = _live_files(log, last)
    if part_ids is not None:
        live = live.filter(F.col("part_id").isin(list(part_ids)))
    groups: dict = {}
    for r in live.collect():
        groups.setdefault(r["part_id"], []).append((r["file"], r["length"]))
    adds = []
    removes = []
    for pid, files in sorted(groups.items()):
        if len(files) < min_files:
            continue
        total = sum(ln for _, ln in files)
        k = max(1, -(-total // target_file_bytes))
        if k >= len(files):
            continue  # rewrite would not reduce the file count
        bucket_dir = f"{base}/{COMPACTED_DIR}/part_id={pid}"
        before = {f for f, _ in _list_parquet_files(spark, bucket_dir)}
        (
            spark.read.parquet(*[f for f, _ in files])
            .coalesce(k)
            .write.mode("append")
            .parquet(bucket_dir)
        )
        after = _list_parquet_files(spark, bucket_dir)
        for f, ln in after:
            if f not in before:
                adds.append((f, ln, int(pid)))
        removes.extend((f, ln, int(pid)) for f, ln in files)
    if not adds:
        return last
    sid = last + 1
    entries = spark.createDataFrame(
        [(f, ln, pid, "add") for f, ln, pid in adds]
        + [(f, ln, pid, "remove") for f, ln, pid in removes],
        "file string, length long, part_id int, op string",
    )
    _append_entries(spark, output_path, sid, entries)
    return sid


def vacuum_snapshots(
    spark: SparkSession, output_path: str, retain_from: int
) -> int:
    """Physically delete data files no retained snapshot references: a
    file removed at snapshot ≤ ``retain_from`` is invisible to every
    snapshot ≥ ``retain_from`` and can go.  Snapshots OLDER than
    ``retain_from`` become unreadable (Iceberg's ``expire_snapshots``).
    Returns the number of files deleted."""
    log = _require_log(spark, output_path)
    dead = (
        log.filter(
            (F.col("op") == "remove") & (F.col("snapshot_id") <= retain_from)
        )
        .select("file")
        .distinct()
        .collect()
    )
    if not dead:
        return 0
    jvm, fs = _fs(spark, output_path)
    n = 0
    for r in dead:
        p = jvm.org.apache.hadoop.fs.Path(r["file"])
        if fs.exists(p):
            fs.delete(p, False)
            n += 1
    return n
