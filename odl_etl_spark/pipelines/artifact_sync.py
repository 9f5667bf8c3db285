"""The artifact export/sync pipeline: the reference's ``mitx_etl``.

Reference flow (``mitx/mitx_etl.py``): enumerate course ids via
subprocess ``:67-84`` → export each as a tar.gz blob ``:86-105`` → tar
the day's folder ``:108-121`` → ``aws s3 sync`` to a date prefix
``:124-155`` → Slack/healthcheck notifications ``:158-192`` →
orchestrated by ``main()`` ``:195-203``.

Spark-native flow: a ``binaryFile`` scan of the landing directory →
blob rows (id, bytes, metadata) → date-partitioned Parquet dataset.
Blobs become queryable lake rows instead of opaque folder trees; the
daily "sync" is a dynamic partition overwrite; notifications are a
driver-side callback hook (data plane stays pure).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odl_etl_spark.io.sinks import partitioned_write
from odl_etl_spark.io.sources import binary_source
from odl_etl_spark.pipelines.notifications import SyncReport


def ingest_artifacts(
    spark: SparkSession, landing_dir: str, glob: str = "*.tar.gz"
) -> DataFrame:
    """Landing directory of opaque artifacts → (artifact_id, content,
    length, modified) rows. artifact_id = file stem, matching the
    reference's ``{course_id}.tar.gz`` naming (mitx_etl.py:96-98)."""
    raw = binary_source(spark, landing_dir, glob=glob)
    return raw.select(
        F.regexp_extract(
            F.element_at(F.split("path", "/"), -1), r"^(.*?)(\.tar\.gz|\.[^.]+)?$", 1
        ).alias("artifact_id"),
        F.col("content"),
        F.col("length"),
        F.col("modificationTime").alias("modified"),
    )


def run_artifact_sync(
    spark: SparkSession,
    landing_dir: str,
    out_path: str,
    ds: str,
    glob: str = "*.tar.gz",
    on_success: Callable[[SyncReport], None] | None = None,
    on_failure: Callable[[SyncReport], None] | None = None,
) -> int:
    """Ingest a day's artifacts into the date-partitioned lake dataset;
    returns artifact count. Notification hooks receive the structured
    ``SyncReport`` (pipelines/notifications.py carries the executable
    Slack-webhook / healthcheck notifiers mirroring mitx_etl.py:158-192);
    the data plane stays decoupled from any endpoint."""
    source = os.path.basename(landing_dir.rstrip("/"))
    try:
        df = ingest_artifacts(spark, landing_dir, glob)
        partitioned_write(df.withColumn("ds", F.lit(ds)), out_path, ("ds",))
        n = spark.read.parquet(out_path).where(F.col("ds") == ds).count()
    except Exception as e:  # noqa: BLE001
        if on_failure is not None:
            on_failure(
                SyncReport(
                    ds=ds, out_path=out_path, source=source, ok=False, error=str(e)
                )
            )
        raise
    if on_success is not None:
        on_success(
            SyncReport(ds=ds, out_path=out_path, source=source, artifact_count=n)
        )
    return n
