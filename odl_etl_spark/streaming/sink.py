"""Streaming lake sink: micro-batches into the partitioned dataset.

``foreachBatch`` hands each micro-batch to the same batch writers the
rest of the engine uses — the streaming form of the reference's daily
sync (``mitx/mitx_etl.py:124-155``): instead of a cron job mirroring
yesterday's folder, every micro-batch lands in its date partitions.

Exactly-once on retries: ``foreachBatch`` is at-least-once (Spark
replays a failed batch with the same ``batch_id``), so the write itself
must be idempotent. Each batch is stamped with a ``_batch_id``
partition column and written with *dynamic partition overwrite* — a
replay rewrites exactly the ``(ds, _batch_id)`` partitions the failed
attempt touched instead of appending duplicates. Readers of the lake
path still prune on ``ds``; ``_batch_id`` is an extra discovered
partition column they can ignore (or drop on read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def write_micro_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_path: str,
    ts_col: str = "ts",
    ds_format: str = "yyyyMMdd",
) -> None:
    """Idempotent landing of one micro-batch: rows are stamped with their
    ``batch_id`` and written under dynamic partition overwrite, so a
    replay of the same batch rewrites its own ``(ds, _batch_id)``
    partitions in place instead of appending a second copy."""
    (
        batch_df.withColumn("ds", F.date_format(ts_col, ds_format))
        .withColumn("_batch_id", F.lit(batch_id))
        .repartition("ds")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ds", "_batch_id")
        .parquet(out_path)
    )


def stream_to_partitioned_parquet(
    events: DataFrame,
    out_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    ds_format: str = "yyyyMMdd",
    available_now: bool = True,
) -> StreamingQuery:
    """Append each micro-batch into ``out_path`` partitioned by the
    ingestion date derived from ``ts_col``."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_micro_batch(batch_df, batch_id, out_path, ts_col, ds_format)

    writer = (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
