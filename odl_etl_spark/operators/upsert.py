"""Partition-scoped upsert (merge) into a Parquet lake dataset.

Plain Parquet has no MERGE; the scalable pattern without a table format
is *partition-scoped copy-on-write*: only the partitions present in the
updates are rewritten (existing-minus-matched ∪ updates), then swapped
in atomically via dynamic partition overwrite. Untouched partitions are
never read or written — at 100 TB a daily upsert touches only the day
partitions in the batch, not the lake.

This generalizes the reference's daily re-sync (``mitx/mitx_etl.py:
124-155`` replaces a whole date prefix): upsert with a full-partition
update set degenerates to exactly that overwrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_partitioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    partition_col: str = "ds",
) -> int:
    """Merge ``updates`` into the dataset at ``path`` by ``keys``.

    Rows in touched partitions whose key matches an update are replaced;
    unmatched rows are kept; update rows are inserted. Returns the number
    of partitions rewritten. ``updates`` must carry ``partition_col``.
    """
    from pyspark.errors import AnalysisException

    keys = list(keys)
    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not touched:
        return 0
    # Only the existence probe may fall back to "first write" — a schema
    # mismatch while building the merge must raise, not silently drop the
    # kept rows of touched partitions.
    try:
        existing = spark.read.parquet(path)
    except AnalysisException:  # path not found: first write
        existing = None
    if existing is not None:
        # Partition discovery INFERS the partition column's type from the
        # directory names; a value whose inferred-type string form differs
        # from the original (ds='01' → int 1) would be irrecoverably
        # renamed before the merge even starts. Re-read with the inferred
        # data-column schema (so a malformed updates frame still raises
        # below) but the partition column pinned to the updates' declared
        # type — Spark then parses directory values as that type directly.
        from pyspark.sql.types import StructField, StructType

        ptype = updates.schema[partition_col].dataType
        fields = [
            StructField(f.name, ptype, f.nullable)
            if f.name == partition_col
            else f
            for f in existing.schema.fields
        ]
        existing = spark.read.schema(StructType(fields)).parquet(path)
    if existing is None:
        merged = updates
    else:
        existing = existing.where(F.col(partition_col).isin(touched))
        kept = existing.join(updates.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(updates.select(*existing.columns))
    # The swap write overwrites the very files the merge plan reads, so
    # the merged set must be durable BEFORE the overwrite. Stage it to a
    # sibling path (a durable, fault-tolerant write — at 100 TB an
    # executor-local localCheckpoint of the touched partitions would pin
    # them on local disks non-fault-tolerantly and serialize the swap
    # behind a non-durable materialization; VERDICT.md r3 #3), then
    # dynamic-partition-overwrite the target FROM the staged files.
    # A per-run uuid suffix keeps concurrent upserts to the same dataset
    # from clobbering each other's staging.
    import uuid

    staging = path.rstrip("/") + ".upsert-staging-" + uuid.uuid4().hex[:12]
    (
        merged.repartition(partition_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(staging)
    )
    # Read staging back with the merged schema declared explicitly:
    # partition discovery would otherwise re-INFER the partition column's
    # type from the directory names, and values whose inferred-type string
    # form differs from the original (ds='01' → int 1 → '1') would come
    # back renamed, silently writing a NEW partition while the stale one
    # survives. With a user-provided schema Spark parses the directory
    # values directly as the declared type and '01' stays '01'.
    staged = spark.read.schema(merged.schema).parquet(staging).select(*merged.columns)
    # Partition-scoped semantics must not hinge on ambient session
    # conf: set dynamic overwrite on THIS write (with Spark's default
    # `static`, mode('overwrite') would delete the entire dataset).
    try:
        (
            staged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
    except Exception as exc:
        raise RuntimeError(
            f"upsert swap into {path} failed mid-commit; the merged data "
            f"survives at {staging} for manual recovery"
        ) from exc
    # Delete staging only AFTER a successful swap: a mid-commit failure
    # can leave target partitions partially deleted, making the staged
    # files the only durable copy of the merged data. On failure the
    # exception propagates with the staging path preserved for recovery.
    # Hadoop FS API so cleanup works on any scheme (s3a/gs/hdfs/file).
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(staging)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(jpath, True)
    return len(touched)
