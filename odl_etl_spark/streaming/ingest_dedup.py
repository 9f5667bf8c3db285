"""Streaming ingest + incremental near-dedup: the true-streaming
counterpart of the ``dedup_stream_ingest`` registry key
(queries/compose.py), the way ``streaming/cdc.py`` is the true-streaming
counterpart of ``stream_cdc_apply``.

Each ``foreachBatch`` micro-batch of arriving documents is MinHash-LSH
probed against everything indexed before it, then COMMITTED: its band
tuples append to a persisted index table and its rows to a persisted
docs store. Generalizes the reference's daily batch cadence
(mitodl/odl-etl mitx_etl.py:16-17, date-suffixed batches) to continuous
arrival with the LLM dedup tier attached.

Scale + correctness posture:

  * The band index is a REAL stored table (parquet, partitioned by
    ``_batch_id``) — the corpus is banded once at bootstrap
    (``_batch_id = -1``), each batch is banded once on arrival, and no
    raw text is ever re-shingled for a later batch's probe
    (``operators/dedup.minhash_band_index`` + the probe's
    ``existing_index`` path). At 100 TB the index is ~16 small rows per
    document, re-partitionable by ``_band`` for probe-side pruning.
  * All three state writes (pairs, index, docs) are dynamic-partition
    overwrites keyed by ``_batch_id``, so an at-least-once replay of a
    micro-batch rewrites its own partitions in place — the loop is
    replay-idempotent without a transaction log (same posture as
    ``streaming/cdc.py`` / the lake sink).
  * Emitted pairs are {(new, previously-indexed)} with batch
    provenance; intra-batch duplicates are by contract the in-batch
    ``dedup_near`` job's concern (see the ``dedup_stream_ingest``
    docstring).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from odl_etl_spark.operators.dedup import minhash_band_index, minhash_lsh_probe

_DOC_COLS = ["doc_id", "text", "source"]


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def bootstrap_corpus_index(
    corpus: DataFrame, state_dir: str, n: int = 3
) -> None:
    """Band the standing corpus ONCE and commit it as ``_batch_id=-1``
    of the index table (and the docs store). Idempotent: re-running
    overwrites the same partitions with identical rows."""
    index = minhash_band_index(corpus, "doc_id", "text", n=n).withColumn(
        "_batch_id", F.lit(-1)
    )
    # docs FIRST, index LAST: ingest_dedup_stream gates auto-bootstrap on
    # the index artifact, so a crash between the two writes leaves a state
    # that re-runs bootstrap on restart instead of wedging every batch on
    # "not bootstrapped" (torn bootstrap is self-healing).
    corpus.select(*_DOC_COLS).withColumn("_batch_id", F.lit(-1)).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy(
        "_batch_id"
    ).parquet(os.path.join(state_dir, "docs"))
    index.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("_batch_id").parquet(os.path.join(state_dir, "index"))


def probe_and_commit_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    n: int = 3,
    threshold: float = 0.8,
) -> None:
    """foreachBatch handler: probe one micro-batch against the stored
    index, land its pairs, then commit its index rows and documents."""
    spark = batch_df.sparkSession
    batch = batch_df.select(*_DOC_COLS)
    docs = _read_or_none(spark, os.path.join(state_dir, "docs"))
    index = _read_or_none(spark, os.path.join(state_dir, "index"))
    if docs is None or index is None:
        raise RuntimeError(
            "ingest_dedup state not bootstrapped - call "
            "bootstrap_corpus_index(corpus, state_dir) first"
        )
    # A replay of batch_id must probe the same "before me" state: exclude
    # this batch's own (possibly already-committed) partitions.
    existing_docs = docs.where(F.col("_batch_id") != batch_id).drop("_batch_id")
    existing_index = index.where(F.col("_batch_id") != batch_id).drop("_batch_id")
    b_index = minhash_band_index(batch, "doc_id", "text", n=n)
    pairs = minhash_lsh_probe(
        batch,
        existing_docs,
        "doc_id",
        "text",
        n=n,
        threshold=threshold,
        new_index=b_index,
        existing_index=existing_index,
    ).withColumn("_batch_id", F.lit(batch_id))
    # Per-write dynamic partitionOverwriteMode (Spark's session default is
    # STATIC): without it, each commit would truncate the whole table to
    # this batch's partition, destroying the standing corpus index
    # (_batch_id=-1) and all prior batches. Matches io/sinks.py and
    # operators/upsert.py rather than relying on session conf.
    pairs.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("_batch_id").parquet(os.path.join(state_dir, "pairs"))
    # Docs BEFORE index (the invariant operators/dedup.py's probe
    # assumes: every index row has a backing doc). A torn commit then
    # leaves "docs without index rows" — equivalent to the batch not yet
    # committed, fixed by replay — instead of "index rows without docs",
    # which the probe's verify joins would silently drop forever.
    batch.withColumn("_batch_id", F.lit(batch_id)).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy(
        "_batch_id"
    ).parquet(os.path.join(state_dir, "docs"))
    b_index.withColumn("_batch_id", F.lit(batch_id)).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy(
        "_batch_id"
    ).parquet(os.path.join(state_dir, "index"))


_STAGE_MARKER = "_STAGE_COMPLETE"


def mark_stage_complete(staged: str) -> None:
    """Stamp a fully-staged swap directory. Every staging producer calls
    this AFTER all staging writes finish and BEFORE the live dir is
    touched; ``recover_torn_swap`` rolls an orphaned stage forward only
    when the stamp proves the stage completed. (Spark's own ``_SUCCESS``
    can't serve as the witness: the session default
    ``partitionOverwriteMode=dynamic`` commits partitioned overwrites
    without one, and the PQ stage is a multi-relation parent dir whose
    per-relation markers sit one level down.)"""
    with open(os.path.join(staged, _STAGE_MARKER), "w") as f:
        f.write("complete")


def _stage_is_complete(staged: str) -> bool:
    return os.path.exists(os.path.join(staged, _STAGE_MARKER)) or os.path.exists(
        os.path.join(staged, "_SUCCESS")
    )


def recover_torn_swap(state_dir: str, subs: tuple[str, ...] = ("docs", "index")) -> None:
    """Crash recovery for ``compact_state``'s directory swap (ADVICE r8
    #2). The swap window — between ``os.rename(path, prev)`` and
    ``os.rename(tmp, path)`` — leaves the live dir ABSENT with the data
    intact at ``<sub>_old`` (and a complete staged copy at
    ``<sub>_compacting``: the staging write finishes before the live dir
    is ever renamed away). Without recovery, a stream restart would
    mistake that for a fresh state and re-bootstrap a corpus-only index,
    silently discarding every committed batch's index rows. Roll the
    swap FORWARD when the staged copy exists AND is complete (the
    producer's ``mark_stage_complete`` stamp — a first-write staging
    can tear with the live dir absent, unlike a compaction's, whose
    staging finishes while the live dir still exists), BACK to the
    ``_old`` backup otherwise; when the live dir is present, leftovers
    from either side of the window are just stale and are removed.
    ``subs`` names the state subdirectories (the ANN ingest loop,
    streaming/ingest_ann.py, reuses this with its single store)."""
    import shutil

    for sub in subs:
        path = os.path.join(state_dir, sub)
        staged = path + "_compacting"
        prev = path + "_old"
        if os.path.exists(path):
            # Live dir present: a leftover staged copy is pre-swap, a
            # leftover backup is post-swap; the live dir is
            # authoritative in both cases.
            shutil.rmtree(staged, ignore_errors=True)
            shutil.rmtree(prev, ignore_errors=True)
        elif os.path.exists(staged):
            if _stage_is_complete(staged):
                # Mid-swap crash: the staged copy is complete (the
                # producer's completion stamp present) — finish the
                # swap it was about to make.
                os.rename(staged, path)
                shutil.rmtree(prev, ignore_errors=True)
            elif os.path.exists(prev):
                # Torn STAGING write with a backup present: the stage
                # never completed; restore the pre-swap copy.
                shutil.rmtree(staged)
                os.rename(prev, path)
            else:
                # Torn FIRST-WRITE staging (live dir never existed, no
                # _SUCCESS): nothing was ever committed — drop the torn
                # copy; the fold/bootstrap that produced it re-runs
                # (watermark is written only after a completed swap).
                shutil.rmtree(staged)
        elif os.path.exists(prev):
            # Backup only (staged copy gone — outside compact_state's
            # own crash window, e.g. partial manual cleanup): restore
            # the pre-compaction copy rather than losing it.
            os.rename(prev, path)


def ingest_dedup_stream(
    arrivals: DataFrame,
    corpus: DataFrame,
    state_dir: str,
    checkpoint: str,
    n: int = 3,
    threshold: float = 0.8,
    available_now: bool = True,
    fold_clusters: bool = False,
) -> StreamingQuery:
    """Run the ingest-dedup loop over a streaming DataFrame of arriving
    documents. Bootstraps the corpus index if absent, then each
    micro-batch probes + commits via ``probe_and_commit_batch``.

    ``fold_clusters=True`` additionally folds each batch's committed
    pairs into the standing duplicate-cluster store
    (``streaming/ingest_clusters.fold_pairs_into_clusters``) after the
    pair commit — the fully-online posture. Ordering matters: pairs
    first (the fold reads the committed store, never the in-flight
    DataFrame), fold second; a replay re-commits the pairs partition
    idempotently and the refold is convergent by the fold's own
    contract.

    A missing index dir is only treated as a torn BOOTSTRAP (safe to
    rebuild) after ``recover_torn_swap`` has ruled out a torn compaction
    swap AND the docs store holds nothing beyond the corpus partition —
    docs with committed batch partitions but no index is an inconsistent
    state a corpus-only re-bootstrap would silently paper over (every
    probe would miss duplicates against those batches), so it raises."""
    spark = arrivals.sparkSession
    recover_torn_swap(state_dir)
    if _read_or_none(spark, os.path.join(state_dir, "index")) is None:
        docs = _read_or_none(spark, os.path.join(state_dir, "docs"))
        if docs is not None:
            latest = docs.agg(F.max("_batch_id")).head()[0]
            if latest is not None and latest > -1:
                raise RuntimeError(
                    f"ingest_dedup state at {state_dir!r} has committed docs "
                    f"through _batch_id={latest} but no index artifact; "
                    "re-bootstrapping would silently drop those batches from "
                    "every future probe. Restore the index (or delete the "
                    "docs store to intentionally start over)."
                )
        bootstrap_corpus_index(corpus, state_dir, n=n)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        probe_and_commit_batch(
            batch_df, batch_id, state_dir, n=n, threshold=threshold
        )
        if fold_clusters:
            from odl_etl_spark.streaming.ingest_clusters import (
                fold_pairs_into_clusters,
            )

            fold_pairs_into_clusters(
                batch_df.sparkSession, state_dir, upto_batch_id=batch_id
            )

    writer = (
        arrivals.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_state(
    spark: SparkSession, state_dir: str, upto_batch_id: int
) -> None:
    """Index maintenance (VERDICT r7 #5): merge every index/docs
    partition with ``_batch_id <= upto_batch_id`` into the baseline
    partition (``_batch_id = -1``), bounding the partition count — at
    continuous-arrival cadence the one-partition-per-micro-batch layout
    is otherwise a small-files problem. The merged index rows are
    re-clustered by ``_band`` on the way in (``repartition("_band")``),
    the probe-side pruning layout the 100 TB note recommends, so a
    band-equality probe reads band-clustered files instead of hundreds
    of per-batch fragments.

    Replay-safety contract: ``upto_batch_id`` must be STRICTLY older
    than the newest committed batch. foreachBatch is at-least-once only
    at the tip — once the checkpoint has committed a later epoch, an
    older batch id can never re-fire — so folding fully-committed
    batches into the baseline cannot create the self-pair hazard (a
    replayed batch finding its own rows in the 'before me' state).
    Enforced with a ValueError; probing and pair emission are unchanged
    because compaction only relabels ``_batch_id`` (the probe's
    exclusion filter matches no compacted row, exactly as before).

    The rewrite goes through a staging directory and swaps in with two
    renames (live -> _old, staged -> live) before the old copy is
    deleted, so a crash at ANY point leaves a complete copy of the data
    on disk (mid-swap it sits at the _old/_compacting paths;
    ``recover_torn_swap`` — run here on entry and by
    ``ingest_dedup_stream`` on startup — completes or rolls back the
    swap, never a silent partial state). The renames are the
    non-atomic step on an object store — a deployment fronts the swap
    with a table format (Delta/Iceberg) or a manifest, same caveat as
    every directory-swap in this repo. Stop the ingest stream before
    compacting: a concurrently running probe may race the swap window.

    Both subdirectories are validated against the replayable-tip guard
    BEFORE either is mutated, so a rejected call mutates nothing even
    when a torn commit left index/docs at different latest batches."""
    import shutil

    recover_torn_swap(state_dir)
    # docs first, index last — same ordering as the commit path. The
    # convention is immaterial HERE (compaction only relabels _batch_id,
    # which the probe's exclusion filter ignores for fully-committed
    # batches), but a mid-loop crash still leaves the two stores at
    # different compaction states, and keeping one ordering everywhere
    # means there is exactly one invariant to reason about (ADVICE r8 #4).
    paths = {sub: os.path.join(state_dir, sub) for sub in ("docs", "index")}
    for sub, path in paths.items():
        latest = spark.read.parquet(path).agg(F.max("_batch_id")).head()[0]
        if latest is not None and upto_batch_id >= latest:
            raise ValueError(
                f"compact_state(upto_batch_id={upto_batch_id}) would fold the "
                f"replayable tip of {sub} (latest committed batch {latest}); "
                "pass upto_batch_id < latest"
            )
    for sub, path in paths.items():
        df = spark.read.parquet(path)
        old = df.where(F.col("_batch_id") <= upto_batch_id).withColumn(
            "_batch_id", F.lit(-1)
        )
        if sub == "index":
            old = old.repartition(F.col("_band"))
        tip = df.where(F.col("_batch_id") > upto_batch_id)
        tmp = path + "_compacting"
        shutil.rmtree(tmp, ignore_errors=True)
        old.unionByName(tip).write.mode("overwrite").partitionBy(
            "_batch_id"
        ).parquet(tmp)
        mark_stage_complete(tmp)
        prev = path + "_old"
        shutil.rmtree(prev, ignore_errors=True)
        os.rename(path, prev)
        os.rename(tmp, path)
        shutil.rmtree(prev)


def emitted_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """All pairs landed so far, with their micro-batch provenance.

    Schema-pinned read: a micro-batch with zero near-dups writes no
    parquet files to its partition (dynamic overwrite of nothing), so
    until the first non-empty batch lands the pairs store has no footer
    to infer from — the explicit schema makes the empty state readable
    (same posture as operators/upsert.py's schema-pinned partition
    reads)."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("new_id", T.LongType()),
            T.StructField("ex_id", T.LongType()),
            T.StructField("jaccard", T.DoubleType()),
            T.StructField("_batch_id", T.IntegerType()),
        ]
    )
    return spark.read.schema(schema).parquet(os.path.join(state_dir, "pairs"))
