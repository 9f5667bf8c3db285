#!/usr/bin/env python
"""Benchmark the declared query set; prints ONE JSON line.

Runs every registry query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], forcing full
materialization through the `noop` sink (computes everything, writes
nothing — measures engine work, not result serialization). One warm
SparkSession for the whole suite (JVM/codegen warm-up amortized, per
BASELINE.md posture).

Methodology (VERDICT.md r3 What's-wrong #5): each query gets one
untimed warm-up run, then `value` per query is the MEDIAN of
$SPARK_GRAFT_BENCH_REPS (default 3) timed runs. Single-shot timings
attributed one-off costs to whichever query hit them first — the r3
"regressions" were dominated by suite-order effects (e.g. the first
mapInPandas query absorbing the entire Python-worker spawn + pandas
import, 10s cold vs 1.1s warm for multimodal_image_features) and OS
page-cache state, not plan changes. `value` is the sum of medians
(warm steady-state suite cost); `wall_seconds` is the raw loop time.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from odl_etl_spark.queries import registry
from odl_etl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    spark = get_spark(
        "odl-etl-bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")

    specs = registry()
    # Warm up the JVM/codegen paths once on the flagship before timing.
    specs["project_hash_email"].build(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # Warm up the PYTHON worker pool before any timed rep (VERDICT r5 #3):
    # the first Arrow-batched stage pays daemon fork + one worker fork per
    # core + the pandas/numpy import, and with per-query warm-ups alone
    # that cost landed in whichever mapInPandas key ran first, flip-
    # flopping its median across rounds (image_features 4.1→0.53→2.09s on
    # an unchanged plan). One untimed pass with exactly `cpus` partitions
    # forks and warms every reusable worker (spark.python.worker.reuse
    # defaults true and killOnIdleTimeout defaults false, so the pool
    # survives the whole suite).
    def _py_warm(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        for pdf in it:
            yield pdf

    spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(
        _py_warm, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    query_reps: dict[str, int] = {}
    t_suite = time.perf_counter()

    # If the harness times the suite out (SIGTERM), emit the partial
    # result instead of dying with no JSON line at all: the completed
    # keys' medians are still valid measurements.
    import signal

    def _dump_partial(signum, frame):  # noqa: ARG001
        partial = {
            "metric": "suite_seconds",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "n_queries": len(timings),
            "reps": reps,
            "query_reps": query_reps,
            "wall_seconds": round(time.perf_counter() - t_suite, 3),
            "partial": True,
        }
        print(json.dumps(partial), flush=True)
        os._exit(1)

    signal.signal(signal.SIGTERM, _dump_partial)

    # Adaptive reps (VERDICT r7 #8): sub-second keys are the noisiest
    # relative to their medians as the registry grows, so they get 2
    # extra reps — a 5-point median for cheap keys costs ~2s total while
    # the heavy keys keep the 3-rep budget.
    # ADVICE r8 #3: the adaptive-rep decision keys off the CURRENT run's
    # 3-rep median, so a key oscillating around the threshold can be a
    # 3-rep median one round and a 5-rep median the next; `query_reps`
    # records the per-key rep count in the artifact so cross-round
    # comparisons can detect (and discount) a cadence change instead of
    # misreading it as drift.
    extra_reps_under = float(os.environ.get("SPARK_GRAFT_BENCH_EXTRA_UNDER", "1.0"))
    # Canonical (alphabetical) suite order, round 13: registry order is
    # the DRIVER CHECK rotation and reshuffles every round — and the
    # round-13 reorder demonstrated a 1.3-2x suite-position warm-up
    # artifact on the first ~30 positions (SCALING.md round-13: every
    # persistent "mover" was an early-position key; isolated medians all
    # at historical level). Benchmarks must not inherit that rotation:
    # a fixed order makes round-over-round per-key diffs order-stable
    # forever (one-time break this round, which the rotation had
    # already broken anyway).
    for name in sorted(specs):
        q = specs[name]
        q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        if statistics.median(runs) < extra_reps_under:
            for _ in range(2):
                t0 = time.perf_counter()
                q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        query_reps[name] = len(runs)
    wall = round(time.perf_counter() - t_suite, 3)
    total = round(sum(timings.values()), 3)

    result = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "reps": reps,
        "query_reps": query_reps,
        "wall_seconds": wall,
    }
    # The driver records a size-capped stdout *tail*; at 122+ queries the
    # one JSON line outgrew the cap in round 2 and its head was truncated
    # (VERDICT.md r2, What's-missing #2). Durable copy goes to disk first;
    # stdout still carries the full line, printed last so the tail keeps
    # as much of it as fits.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_SUMMARY.json"), "w") as f:
        json.dump(result, f, indent=1)
    # ALSO write a per-core-count copy (VERDICT r17 #3): the driver runs
    # the bench at two core counts and BENCH_SUMMARY.json is overwritten
    # per run, so the 32-core per-key map was lost to the 8-core run.
    # Additive artifact only; the stdout contract is unchanged.
    with open(os.path.join(here, f"BENCH_SUMMARY_c{cpus}.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "reps": reps,
                "wall_seconds": wall,
                "detail": "BENCH_SUMMARY.json",
                "queries": dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
