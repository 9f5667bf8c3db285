"""Catalog maintenance: table registration + partition discovery.

Spark-first form of the reference's ``mailgun_crawler``
(``manage_crawler_targets.py:1-9``): instead of listing S3 prefixes with
boto3 and pointing an AWS Glue crawler at them, register the dataset as
an external partitioned table and let ``recoverPartitions`` (MSCK) scan
the directory tree — same Hive-metastore-compatible outcome, no side
service, and new partitions become immediately prunable by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_parquet_table(
    spark: SparkSession,
    name: str,
    path: str,
    partition_cols: list[str] | tuple[str, ...] = (),
) -> None:
    """Register an external Parquet dataset as a (partitioned) table.

    Schema is inferred from the files (the crawler's job in the
    reference); partition columns come from the directory layout.
    """
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    sample = spark.read.parquet(path)
    data_cols = [
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in sample.schema.fields
        if f.name not in partition_cols
    ]
    part_cols = [
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in sample.schema.fields
        if f.name in partition_cols
    ]
    partition_clause = (
        f"PARTITIONED BY ({', '.join(part_cols)})" if part_cols else ""
    )
    spark.sql(
        f"CREATE TABLE {name} ({', '.join(data_cols)}) USING parquet "
        f"{partition_clause} LOCATION '{path}'"
    )
    if part_cols:
        recover_partitions(spark, name)


def recover_partitions(spark: SparkSession, name: str) -> int:
    """Discover partition directories (the reference's S3 prefix listing,
    ``manage_crawler_targets.py:3-6``) and sync them into the catalog.
    Returns the partition count after recovery."""
    spark.catalog.recoverPartitions(name)
    return spark.sql(f"SHOW PARTITIONS {name}").count()
