#!/usr/bin/env python
"""Fold-cadence amortization probe (VERDICT r11 #5).

``streaming/ingest_clusters.fold_pairs_into_clusters`` commits the
clusters relation through an atomic whole-store swap, so each fold's
write cost is O(|labels|) BY DESIGN (the documented price of replay
convergence — partial per-shard commits were built and rejected, see
the module docstring). The standing guidance was "fold every K batches
to amortize"; this probe turns K into a number.

Method: build a standing clusters store at two label scales (N and
10N) through the fold path itself (synthetic disjoint pairs — every
pair is its own 2-node component, so |labels| = 2·|pairs| exactly),
then time a fold of one FIXED-SIZE incremental batch (2,000 pairs,
the sf0.1 ingest-loop shape) into each store, fresh watermark each
rep, median of 3. The difference between the two medians is the pure
O(|labels|) term; dividing by the measured per-micro-batch ingest cost
(~1 s at bench scale, adjudicated r9) gives the cadence K at which the
swap adds <=50% to ingest cost.

Run:  python tools/fold_cadence_probe.py [OUT.json]
Writes one JSON object; SCALING.md cites it.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "fold_probe"
)
N_PAIRS_BASE = 50_000  # -> 100k labels; 10x -> 1M labels
BATCH_PAIRS = 2_000
REPS = 3


def _write_pairs(spark, state_dir, batch_id, n_pairs, base):
    """n_pairs disjoint (src, dst) pairs with ids starting at `base`."""
    (
        spark.range(n_pairs)
        .select(
            (F.col("id") * 2 + base).alias("new_id"),
            (F.col("id") * 2 + base + 1).alias("ex_id"),
            F.lit(1.0).alias("jaccard"),
            F.lit(batch_id).cast("int").alias("_batch_id"),
        )
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(os.path.join(state_dir, "pairs"))
    )


def probe(spark, factor: int) -> dict:
    from odl_etl_spark.streaming.ingest_clusters import (
        clusters,
        fold_pairs_into_clusters,
    )

    state = os.path.join(ROOT, f"x{factor}")
    shutil.rmtree(state, ignore_errors=True)
    n0 = N_PAIRS_BASE * factor
    _write_pairs(spark, state, 0, n0, 0)
    fold_pairs_into_clusters(spark, state, upto_batch_id=0)
    n_labels = clusters(spark, state).count()
    times = []
    for rep in range(REPS + 1):  # first is warm-up shape (new batch each rep)
        bid = rep + 1
        _write_pairs(spark, state, bid, BATCH_PAIRS, 10_000_000 + bid * 10 * BATCH_PAIRS)
        t0 = time.monotonic()
        fold_pairs_into_clusters(spark, state, upto_batch_id=bid)
        dt = time.monotonic() - t0
        if rep > 0:
            times.append(dt)
    return {
        "n_labels_standing": int(n_labels),
        "fold_secs_median": round(statistics.median(times), 3),
        "fold_secs_all": [round(t, 3) for t in times],
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "FOLD_CADENCE_PROBE.json"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = {"batch_pairs": BATCH_PAIRS, "reps": REPS}
    for factor in (1, 10):
        res[f"x{factor}"] = probe(spark, factor)
    t1, t10 = res["x1"]["fold_secs_median"], res["x10"]["fold_secs_median"]
    res["ratio_at_10x_labels"] = round(t10 / max(t1, 1e-9), 2)
    # Per-label marginal swap cost from the two scales.
    dl = res["x10"]["n_labels_standing"] - res["x1"]["n_labels_standing"]
    res["swap_secs_per_million_labels"] = round((t10 - t1) / dl * 1e6, 3)
    # K such that amortized fold cost <= 50% of the ~1 s/micro-batch
    # ingest fixed cost (adjudicated r9, SCALING.md).
    ingest_batch_secs = 1.0
    res["recommended_K"] = {
        f"labels_{res[f'x{f}']['n_labels_standing']}": max(
            1, int(res[f"x{f}"]["fold_secs_median"] / (0.5 * ingest_batch_secs) + 0.999)
        )
        for f in (1, 10)
    }
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
