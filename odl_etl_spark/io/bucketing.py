"""Bucketed tables: pre-shuffled storage for shuffle-free joins.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both sides
on the key. Writing both tables bucketed by that key (same bucket count)
pays that shuffle once at write time; every subsequent join or
aggregation on the key is exchange-free — the plan-level proof is
``shuffle_count == 0`` (asserted in tests/test_bucketing.py).

This is the Spark-native successor to the reference's layout-as-contract
idea (date-prefix partitioning, ``mitx_etl.py:138``): partitioning
prunes, bucketing co-locates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed table (metastore keeps the layout).

    With ``path`` the table is external at that location (bucketing
    metadata still lives in the catalog) — use an absolute path so the
    layout doesn't land under the session's cwd-relative warehouse dir.
    """
    import shutil

    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    if path is not None:
        shutil.rmtree(path, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — planned without any exchange."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
