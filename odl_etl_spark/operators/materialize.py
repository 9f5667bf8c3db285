"""One configurable lineage-cut primitive for iterative operators.

Iterative DataFrame algorithms (pagerank, connected components, the
two-level global rank, LSH candidate mining) must materialize
intermediate tables: without a lineage cut, a table read by two plan
branches re-executes its upstream pipeline per branch — and for
``repartitionByRange`` inputs the two executions may even sample
different range boundaries (the r4 ranking bug). Every such site used
to hand-roll ``localCheckpoint(eager=True)`` with a "swap for reliable
checkpoint at cluster scale" comment; this helper makes that swap an
actual runtime switch instead of a code edit (VERDICT.md r4,
Next-round #2).

Modes (per-call argument, else session conf ``MODE_CONF``, else local):

- ``local`` — ``localCheckpoint(eager=True)``. Fastest: blocks live on
  executor local disk/memory, lineage truncated. NOT fault-tolerant —
  an executor loss makes its blocks unrecoverable and fails the job.
  The right default on a stable cluster or local[] testing.
- ``checkpoint`` — reliable ``checkpoint(eager=True)`` to the configured
  checkpoint dir (``SparkContext.setCheckpointDir``, a DFS path at
  cluster scale). Survives executor loss mid-iteration: blocks are
  re-read from the DFS, nothing is recomputed. Requires the dir to be
  set; raises a clear error otherwise rather than silently degrading.
- ``persist`` — ``persist(DISK_ONLY)`` forced eager with a ``count()``.
  Middle ground: lineage is kept, so a lost block is *recomputed* from
  upstream (correct but potentially expensive, and for range-sampled
  inputs the recompute reuses the already-written shuffle output, so
  boundary consistency holds unless the shuffle data itself is lost).
  Use when no DFS checkpoint dir exists but executor loss must not
  fail the job outright. NOT for iterative loops: because lineage is
  kept, each iteration's plan nests every prior iteration's — analysis
  cost grows superlinearly (round-8 measurement: `dedup_cluster`
  >200s under persist vs 3.6s under local; PROFILE_ITERATIVE.json).
  Iterative callers need a true lineage CUT (local/checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MODE_CONF = "spark.odl_etl.materialize.mode"
_MODES = ("local", "checkpoint", "persist")


def materialize(df: DataFrame, mode: str | None = None) -> DataFrame:
    """Materialize ``df`` eagerly and cut (or pin) its lineage.

    ``mode`` overrides the session conf ``spark.odl_etl.materialize.mode``
    (default ``local``). Returns a DataFrame whose plan reads the
    materialized blocks; in every mode the data is fully computed before
    this returns, so two downstream branches observe one physical result.
    """
    spark = df.sparkSession
    if mode is None:
        mode = spark.conf.get(MODE_CONF, "local")
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode == "checkpoint":
        sc = spark.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            raise ValueError(
                "materialize(mode='checkpoint') needs a reliable checkpoint "
                "dir: call spark.sparkContext.setCheckpointDir('<dfs path>') "
                "first (or use mode='local'/'persist')"
            )
        return df.checkpoint(eager=True)
    if mode == "persist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        out.count()  # force materialization NOW, like the eager checkpoints
        return out
    raise ValueError(f"materialize: unknown mode {mode!r}; expected one of {_MODES}")
