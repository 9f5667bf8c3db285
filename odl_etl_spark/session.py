"""SparkSession factory with the engine's scale posture baked in.

The reference runs eager single-process pandas
(``/root/reference/email_mapping/email_mapping.py:43-54``); this engine
targets a multi-executor cluster, so the session defaults encode the
100 TB posture up front:

  * AQE on (runtime partition coalescing, skew-join splitting, dynamic
    join-strategy switches) — the single biggest lever at scale.
  * UTC session timezone — deterministic timestamp semantics across
    engines (needed for the DuckDB differential oracle too).
  * Dynamic partition overwrite — the A7 "daily re-sync" sink semantics
    (``mitx/mitx_etl.py:124-155``) without clobbering sibling partitions.
  * ``nanosAsLong`` — ns-precision Parquet timestamps (events.ts) read as
    int64; ``io.sources`` converts to timestamp at µs precision.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the local[32] harness; on a real cluster these come from
# spark-submit conf. Shuffle partitions should be ~2-3x total cores and
# sized so a partition is O(100-200 MB) at the target data scale; AQE
# coalesces the excess at runtime, so err on the high side for 100 TB.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Runtime bloom-filter join pruning: when a join is a SHUFFLE join
    # (dim too big to broadcast — the 100 TB case) with a selective
    # creation side, Spark injects a bloom_filter_agg of the join keys
    # and semi-filters the fact scan before the exchange. No-op at
    # fixture scale (every dim broadcasts, which already prunes);
    # pinned under forced-shuffle conditions in tests/test_plans.py.
    # (Spark 4 defaults this on; set explicitly so the posture survives a
    # deployment that flips the default. Key name verified against SQLConf
    # — tests/test_session.py asserts it appears in `SET -v`.)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Fixture timestamps are Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false);
    # read them as TIMESTAMP (session tz = UTC above), not TIMESTAMP_NTZ, so
    # unix_micros()/windowing semantics match DuckDB's naive-µs reading.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "odl-etl-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``; on a cluster, pass None and let spark-submit decide.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def enable_durable_materialize(spark: SparkSession, checkpoint_dir: str) -> None:
    """Switch every iterative operator's lineage cut to reliable DFS
    checkpointing in one call (the cluster fault-tolerance posture;
    see ``operators/materialize.py``). ``checkpoint_dir`` should be a
    DFS path (hdfs://, s3a://) on a real cluster — executor-local
    ``localCheckpoint`` blocks die with their executor mid-iteration."""
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    spark.conf.set("spark.odl_etl.materialize.mode", "checkpoint")


def cluster_conf(
    total_cores: int = 4000,
    input_tb: float = 100.0,
    target_partition_mb: int = 192,
) -> dict[str, str]:
    """Recommended conf for a real cluster run at ~``input_tb`` scale.

    Rationale per key (the local DEFAULT_CONF posture scaled up):
      * shuffle partitions ≈ max(2-3× total cores, data/target-size) — big
        enough that a post-shuffle partition fits in executor memory,
        with AQE coalescing the excess at runtime;
      * maxPartitionBytes bounds scan task size (stable task runtimes);
      * broadcast threshold generous — dims up to 256 MB stay broadcast;
      * Kryo + compressed shuffle for network-bound stages.
    """
    by_size = int(input_tb * 1024 * 1024 / target_partition_mb)
    shuffle_parts = max(total_cores * 3, min(by_size, 200_000))
    return {
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(256 * 1024 * 1024),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.shuffle.compress": "true",
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        # At cluster scale dims routinely exceed even the generous
        # broadcast threshold; runtime bloom filters then prune the
        # fact side of the resulting shuffle joins.
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    }


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable conf to an externally-created
    session (the driver hands us one in ``__spark_entry__.entry``)."""
    for k, v in DEFAULT_CONF.items():
        if k.startswith("spark.sql.") and k != "spark.sql.legacy.parquet.nanosAsLong":
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # static conf on a live session — keep the session's value
    # nanosAsLong is session-settable in Spark 4; events reads need it.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    return spark
