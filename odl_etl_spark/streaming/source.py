"""Streaming sources.

The engine's stream source is a file-discovery parquet stream — the
Structured Streaming generalization of the reference's daily-batch
ingestion (``mitx/mitx_etl.py:16-17`` date-suffixed folders: each day's
folder is a micro-batch; here each discovered file is). In production
the same builders run unchanged on Kafka/Kinesis sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # ns under nanosAsLong
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``readStream`` over a directory of events parquet files, with the
    same ns→µs timestamp normalization as the batch loader."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
