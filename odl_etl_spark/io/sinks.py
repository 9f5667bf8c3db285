"""Sinks: partitioned Parquet with dynamic overwrite, compaction.

Spark-first forms of the reference's load surface:
  * ``partitioned_write`` — ``mitx/mitx_etl.py:124-155`` mirrors a daily
    folder to ``s3://bucket/<YYYYMMDD>`` via ``aws s3 sync``; here it's a
    ``partitionBy`` write with *dynamic* partition overwrite: re-running a
    day replaces exactly that day's partition, leaving siblings intact
    (the property `s3 sync` was approximating).
  * ``compact`` — ``mitx_etl.py:108-121`` tars a folder into one
    artifact; the columnar analogue is coalescing small files into
    right-sized Parquet (small-files is the #1 lake read-perf killer).
Paths take any Hadoop-supported scheme — ``s3a://`` in production,
``file:/`` in tests; the code is identical (no local staging + manual
upload like ``email_mapping.py:56-68``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_SINK_GC_DONE = False
_SINK_GC_MAX_AGE_S = 2 * 24 * 3600  # two days — far past any live session


def _gc_stale_sink_dirs(root: str, keep_app_id: str) -> None:
    """Prune sibling sessions' leftover scratch dirs (ADVICE r13 #2).

    Session-keyed dirs stopped self-overwriting when the fixed path
    went per-applicationId, so dead sessions leave full table copies
    under the shared root forever. On first use per process, remove
    siblings untouched for >2 days. Most builders rewrite their dir on
    every run, refreshing mtime — but MARKER-CACHED layouts
    (``scan_dpp_join``) deliberately never rewrite, so liveness is
    judged by the NEWEST mtime among the dir and its sentinel files
    (``_LAYOUT_COMPLETE`` / ``_STAGE_COMPLETE``), which marker-reusing
    builders re-touch on every reuse (ADVICE r14 #1): a >2-day-old
    session holding a still-in-use layout keeps it alive by touching,
    so the GC never races a concurrent reader. Best-effort: GC failure
    must never fail the write that triggered it.
    """
    import os
    import shutil
    import time

    global _SINK_GC_DONE
    if _SINK_GC_DONE:
        return
    _SINK_GC_DONE = True
    try:
        now = time.time()
        for entry in os.scandir(root):
            if not entry.is_dir() or entry.name.endswith(keep_app_id):
                continue
            try:
                newest = entry.stat().st_mtime
                for sentinel in ("_LAYOUT_COMPLETE", "_STAGE_COMPLETE"):
                    p = os.path.join(entry.path, sentinel)
                    if os.path.exists(p):
                        newest = max(newest, os.stat(p).st_mtime)
                if now - newest > _SINK_GC_MAX_AGE_S:
                    shutil.rmtree(entry.path, ignore_errors=True)
            except OSError:
                continue
    except OSError:
        pass


def session_sink_dir(spark: SparkSession, name: str) -> str:
    """Session-unique scratch sink dir for roundtrip/sink query keys.

    A FIXED path let one session's rmtree/rewrite race another
    session's in-flight read of the same key (observed round 13:
    a sweep's widening scan read one era while a concurrent debug
    session rewrote the layout). applicationId is stable within a
    session — each builder still overwrites its own dir on re-run —
    and unique across sessions, so concurrent sessions cannot collide.
    Stale sibling-session dirs are pruned once per process on first
    use (``_gc_stale_sink_dirs``).
    """
    import os
    import tempfile

    root = os.path.join(tempfile.gettempdir(), "odl_etl_spark_sink")
    app_id = spark.sparkContext.applicationId
    _gc_stale_sink_dirs(root, app_id)
    return os.path.join(root, f"{name}_{app_id}")


def partitioned_write(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | tuple[str, ...] = ("ds",),
    mode: str = "overwrite",
    files_per_partition: int = 1,
) -> None:
    """Date/key-partitioned Parquet write. Dynamic partition overwrite is
    set on the write itself (not inherited from session conf): ``overwrite``
    replaces only the partitions present in ``df`` — with Spark's default
    ``static`` mode it would wipe sibling partitions.

    Repartitioning on the key first gives one right-sized file per
    partition instead of the tasks×partitions sliver blowup; but keying
    purely on the partition column funnels each date's rows through ONE
    task, which caps write parallelism at #dates. ``files_per_partition``
    salts the repartition so each date fans out to that many writer
    tasks/files — size it as partition_bytes / target_file_bytes (e.g. a
    10 GB day at 512 MB targets → 20)."""
    cols = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        salt = F.pmod(F.xxhash64(*df.columns), F.lit(files_per_partition))
        out = df.repartition(*cols, salt.alias("_salt"))
    else:
        out = df.repartition(*cols)
    (
        out.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def with_ds(df: DataFrame, ts_col: str, fmt: str = "yyyyMMdd") -> DataFrame:
    """Derive the reference's ``%Y%m%d`` ingestion-date partition key
    (``mitx_etl.py:16-17``) from an event-time column."""
    return df.withColumn("ds", F.date_format(ts_col, fmt))


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_files: int | None = None,
    target_mb: int = 256,
) -> int:
    """Rewrite a dataset into ~target-sized files; returns file count.

    If ``target_files`` is not given it is estimated from the input bytes
    so output files land near ``target_mb``. Uses coalesce (no shuffle)
    — order within files is preserved, only grouping changes.

    Input size comes from the Hadoop FileSystem API, so the estimate is
    correct for any scheme (``s3a://``, ``hdfs://``, ``file:/``) — a
    local ``glob`` would see 0 bytes on an object store and collapse the
    whole dataset into one task.
    """
    df = spark.read.parquet(path)
    if target_files is None:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        total = fs.getContentSummary(jpath).getLength()
        target_files = max(1, round(total / (target_mb * 1024 * 1024)))
    df.coalesce(target_files).write.mode("overwrite").parquet(out_path)
    return target_files
