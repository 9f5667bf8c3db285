#!/usr/bin/env python
"""Probe-side A/B: flat PQ vs composed IVF-PQ (IVFADC) against STORED
index artifacts — the measurement behind `sim_ann_ivfpq`'s scale claim.

The in-query keys bundle index construction with the search, so their
timings say nothing about the steady-state cost a deployment pays: the
index is built once and every query is a probe. This script builds both
index layouts ONCE at the given corpus (flat: codebook + unpartitioned
codes; IVFADC: codebook + cell_id-PARTITIONED codes — the stored layout
whose partition pruning the cell filter exercises), parquet-persists
them, then times the two probes over the stored relations (fresh
probe vectors, median of N reps after one warm-up).

What the composed layout buys, mechanically: flat PQ ADC-scans EVERY
stored code row per query; IVFADC's cell filter prunes the codes scan
to nprobe/n_cells of the files before a byte of ADC work happens. Both
probes end in the same R_MAX-capped exact re-rank.

Usage: python tools/ann_probe_bench.py [corpus_dir] [out.json] [reps]
(corpus_dir defaults to .scale/sf100p — 2M vectors; falls back to
/root/testdata/sf0.1 when the probe corpus is absent)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CORPUS = os.path.join(REPO, ".scale", "sf100p")


def main() -> None:
    explicit = len(sys.argv) > 1
    corpus = sys.argv[1] if explicit else DEFAULT_CORPUS
    if not os.path.exists(os.path.join(corpus, "embeddings.parquet")):
        if explicit:
            # Never silently benchmark a different corpus than the one
            # asked for — a typo'd path must fail, not publish sf0.1
            # numbers under the requested label.
            raise SystemExit(f"no embeddings.parquet under {corpus}")
        corpus = "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ann_probe_bench.json"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from pyspark.sql import functions as F

    from odl_etl_spark.io.sources import load_table
    from odl_etl_spark.operators.ann_index import (
        ivf_residual_explode,
        ivfpq_probe,
        pq_codebook,
        pq_encode,
        pq_explode,
        pq_probe,
        pq_r_pool,
    )
    from odl_etl_spark.operators.similarity import IvfIndex
    from odl_etl_spark.session import get_spark

    spark = get_spark(
        "ann-probe-bench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    store = os.path.join(REPO, ".scale", "ann_probe_store")
    shutil.rmtree(store, ignore_errors=True)
    e = load_table(spark, corpus, "embeddings")
    ev = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    n_corpus = ev.where(F.col("vec_id") != 0).count()

    t0 = time.perf_counter()
    ex_flat = pq_explode(ev)
    cent_flat = pq_codebook(ex_flat)
    cent_flat.write.parquet(os.path.join(store, "flat_cent"))
    pq_encode(ex_flat, cent_flat).write.parquet(os.path.join(store, "flat_codes"))
    flat_build_s = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    index = IvfIndex.build(e, n_cells=8)
    assigned = index.assign(e.where(F.col("vec_id") != 0))
    ex_res = ivf_residual_explode(assigned, index.centroids)
    cent_res = pq_codebook(ex_res)
    cent_res.write.parquet(os.path.join(store, "ivfpq_cent"))
    pq_encode(ex_res, cent_res, extra_keys=("cell_id",)).write.partitionBy(
        "cell_id"
    ).parquet(os.path.join(store, "ivfpq_codes"))
    cell_counts = {
        int(r["cell_id"]): int(r["n"])
        for r in assigned.groupBy("cell_id").agg(F.count("*").alias("n")).collect()
    }
    ivfpq_build_s = round(time.perf_counter() - t0, 2)

    flat_cent = spark.read.parquet(os.path.join(store, "flat_cent"))
    flat_codes = spark.read.parquet(os.path.join(store, "flat_codes"))
    res_cent = spark.read.parquet(os.path.join(store, "ivfpq_cent"))
    res_codes = spark.read.parquet(os.path.join(store, "ivfpq_codes"))

    # Fresh probe vectors per rep (corpus members, taken FROM the corpus
    # so any id layout works) so no rep hits a cached result; one
    # untimed warm-up each. reps beyond the corpus size are clamped
    # loudly rather than silently truncated.
    rows = e.orderBy(F.col("vec_id").asc()).limit(reps + 1).collect()
    if len(rows) < reps + 1:
        print(f"corpus has only {len(rows)} vectors; clamping reps to {len(rows) - 1}")
        reps = len(rows) - 1
    probe_ids = [int(r["vec_id"]) for r in rows]
    probes = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows
    }

    def run_flat(pv):
        pq_probe(flat_codes, flat_cent, ev, pv, pq_r_pool(n_corpus), k=10).collect()

    def run_ivfpq(pv):
        cells = index.nearest_cells(pv, nprobe=2)
        n_probed = sum(cell_counts[c] for c in cells)
        ivfpq_probe(
            res_codes, res_cent, ev, pv, index.centroids, cells,
            pq_r_pool(n_probed), k=10,
        ).collect()

    results: dict[str, dict] = {}
    for name, fn in (("flat_pq_probe", run_flat), ("ivfpq_probe", run_ivfpq)):
        fn(probes[probe_ids[0]])  # warm-up
        times = []
        for pid in probe_ids[1:]:
            t0 = time.perf_counter()
            fn(probes[pid])
            times.append(round(time.perf_counter() - t0, 3))
        results[name] = {"median_s": statistics.median(times), "reps": times}
        print(f"{name}: median {results[name]['median_s']}s {times}", flush=True)

    out = {
        "corpus": corpus,
        "n_vectors": n_corpus,
        "n_cells": 8,
        "nprobe": 2,
        "build_s": {"flat_pq": flat_build_s, "ivfpq": ivfpq_build_s},
        "probe": results,
        "speedup": round(
            results["flat_pq_probe"]["median_s"]
            / max(results["ivfpq_probe"]["median_s"], 1e-9),
            2,
        ),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("n_vectors", "speedup")}))
    shutil.rmtree(store, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
