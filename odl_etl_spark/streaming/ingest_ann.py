"""Streaming ingest for the persisted vector index: the
``ingest_dedup`` posture applied to the ANN tier (VERDICT r8
What's-missing #3 — the stored hyperplane/PQ/IVF indexes were
build-once; a daily-ingest lake needs the arriving vectors
append-encoded into the stored relation).

Each ``foreachBatch`` micro-batch of arriving ``(vec_id, embedding)``
rows is encoded against the STAMPED plane set via
``operators/ann_index.hyperplane_index_append`` — which refuses
unstamped or param-mismatched stores, so a drifted deployment fails
loudly instead of silently mis-bucketing — and committed to the index
store under its ``_batch_id`` partition.

Scale + correctness posture (inherited from streaming/ingest_dedup.py):

  * The index is a REAL stored table (parquet, partitioned by
    ``_batch_id``): the corpus is encoded once at bootstrap
    (``_batch_id = -1``), each batch once on arrival; raw vectors are
    never re-encoded for a later probe. At 100 TB re-cluster by
    ``bucket`` via ``compact_ann_state`` so Hamming probes prune.
  * Commits are per-write dynamic-partition overwrites keyed by
    ``_batch_id`` — an at-least-once replay rewrites its own partition
    in place (replay-idempotent, no transaction log).
  * ``recover_torn_swap`` runs on startup, so a crash inside
    ``compact_ann_state``'s directory swap self-heals instead of
    re-bootstrapping a corpus-only index (the ADVICE r8 #2 class).
  * Because the planes are fixed parameters, the ingested index is
    bit-identical to a full rebuild at every point in time — pinned
    stream ≡ batch in tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from odl_etl_spark.operators.ann_index import (
    hyperplane_index,
    hyperplane_index_append,
    hyperplane_probe,
)
from odl_etl_spark.streaming.ingest_dedup import _read_or_none, recover_torn_swap

_SUB = "index"


def _index_path(state_dir: str) -> str:
    return os.path.join(state_dir, _SUB)


def bootstrap_ann_index(
    corpus: DataFrame, state_dir: str, planes: list[list[float]]
) -> None:
    """Encode the standing corpus ONCE and commit it as ``_batch_id=-1``.
    Idempotent: re-running overwrites the same partition with identical
    rows (dynamic overwrite, fixed planes)."""
    hyperplane_index(corpus, planes).withColumn(
        "_batch_id", F.lit(-1)
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("_batch_id").parquet(_index_path(state_dir))


def append_and_commit_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    planes: list[list[float]],
) -> None:
    """foreachBatch handler: validate the store's param stamps, encode
    ONLY this batch's vectors, commit under ``_batch_id``. A replay
    overwrites its own partition byte-identically (the encode is a pure
    function of (vectors, planes))."""
    spark = batch_df.sparkSession
    index = _read_or_none(spark, _index_path(state_dir))
    if index is None:
        raise RuntimeError(
            "ann ingest state not bootstrapped - call "
            "bootstrap_ann_index(corpus, state_dir, planes) first"
        )
    rows = hyperplane_index_append(index.drop("_batch_id"), batch_df, planes)
    rows.withColumn("_batch_id", F.lit(batch_id)).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy(
        "_batch_id"
    ).parquet(_index_path(state_dir))


def ingest_ann_stream(
    arrivals: DataFrame,
    corpus: DataFrame,
    state_dir: str,
    checkpoint: str,
    planes: list[list[float]],
    available_now: bool = True,
) -> StreamingQuery:
    """Run the vector-ingest loop over a streaming DataFrame of arriving
    ``(vec_id, embedding)`` rows. Bootstraps the corpus index if absent
    — after ``recover_torn_swap`` has ruled out a torn compaction swap,
    so committed batches are never silently discarded."""
    recover_torn_swap(state_dir, subs=(_SUB,))
    if _read_or_none(arrivals.sparkSession, _index_path(state_dir)) is None:
        bootstrap_ann_index(corpus, state_dir, planes)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        append_and_commit_batch(batch_df, batch_id, state_dir, planes)

    writer = (
        arrivals.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stored_index(spark: SparkSession, state_dir: str) -> DataFrame:
    """The full committed signature relation (all batches), ready for
    ``hyperplane_probe``."""
    return spark.read.parquet(_index_path(state_dir)).drop("_batch_id")


def probe_state(
    spark: SparkSession,
    state_dir: str,
    raw: DataFrame,
    probe_vec: list[float],
    probe_bucket: int,
    planes: list[list[float]],
    radius: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Hamming-radius probe + exact re-rank against the ingested store —
    identical to probing a freshly rebuilt index (append ≡ rebuild)."""
    return hyperplane_probe(
        stored_index(spark, state_dir),
        raw,
        probe_vec,
        probe_bucket,
        planes=planes,
        radius=radius,
        k=k,
        id_col=id_col,
    )


def compact_ann_state(
    spark: SparkSession, state_dir: str, upto_batch_id: int
) -> None:
    """Fold committed batches ``<= upto_batch_id`` into the baseline
    partition, re-clustered by ``bucket`` — the probe-pruning layout.
    Same replay-safety contract and crash-safe staged swap as
    ``ingest_dedup.compact_state``: ``upto_batch_id`` must be strictly
    older than the newest committed batch (ValueError otherwise), the
    rewrite lands in ``index_compacting`` and swaps in with two renames,
    and ``recover_torn_swap`` (run here and at stream startup) completes
    or rolls back a torn swap."""
    import shutil

    recover_torn_swap(state_dir, subs=(_SUB,))
    path = _index_path(state_dir)
    latest = spark.read.parquet(path).agg(F.max("_batch_id")).head()[0]
    if latest is not None and upto_batch_id >= latest:
        raise ValueError(
            f"compact_ann_state(upto_batch_id={upto_batch_id}) would fold "
            f"the replayable tip (latest committed batch {latest}); pass "
            "upto_batch_id < latest"
        )
    df = spark.read.parquet(path)
    old = (
        df.where(F.col("_batch_id") <= upto_batch_id)
        .withColumn("_batch_id", F.lit(-1))
        .repartition(F.col("bucket"))
    )
    tip = df.where(F.col("_batch_id") > upto_batch_id)
    tmp = path + "_compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    old.unionByName(tip).write.mode("overwrite").partitionBy("_batch_id").parquet(tmp)
    prev = path + "_old"
    shutil.rmtree(prev, ignore_errors=True)
    os.rename(path, prev)
    os.rename(tmp, path)
    shutil.rmtree(prev)
