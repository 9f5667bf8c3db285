"""Isolated-median bench — the artifact of record for the heavy keys
(VERDICT r8 #3).

The suite bench (bench.py) shares one JVM across 182 keys; the
builder's round-8 same-code A/B showed a 15.6% suite-level delta hours
apart, so suite medians can no longer distinguish a real 1.3x
regression on a single key. This script generalizes the
PROFILE_ITERATIVE.json methodology to an arbitrary key list: FRESH
SparkSession per key, one untimed warm-up, then median of N timed reps
through the noop sink. Round-over-round drift comparisons in SCALING.md
cite these numbers, not suite readings.

Default key list = the top-10 heaviest keys of the round-8 suite bench
plus the dedup-family watch list (already inside that top-10).

Run:  python tools/bench_isolated.py [OUT.json] [reps] [key1,key2,...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Top-10 of BENCH_r08's suite readings; includes every VERDICT r8 watch
# item (corpus_curation_funnel, dedup_stream_ingest, dedup_near).
DEFAULT_KEYS = [
    "corpus_curation_funnel",
    "dedup_stream_ingest",
    "dedup_cluster",
    "dedup_near",
    "graph_pagerank",
    "dedup_simhash",
    "sink_upsert",
    "dedup_incremental",
    "agg_exact_median",
    "sim_ann_pq_probe",
]


# Ambient-load precondition (VERDICT r16 #3 -> codified r17): the r16
# anchor retake read 8.32s for a 2.6s key under host-level steal
# (loadavg 3-6 with NO local consumer) and was only caught because the
# discrepancy was re-checked by hand. An isolated median taken on a
# loaded box is not an anchor; stamp the 1-minute loadavg into the
# artifact per key and mark readings above the threshold so they can
# never silently become anchors. Threshold: on a quiet box loadavg is
# <0.5; anything above ~2 means another consumer owns a core-scale
# share of the machine.
LOADAVG_WARN = float(os.environ.get("SPARK_GRAFT_LOADAVG_WARN", "2.0"))


def read_loadavg() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        return -1.0  # unknown platform — stamped as -1, never warns


def run_one(key: str, reps: int) -> dict:
    from odl_etl_spark.queries import registry
    from odl_etl_spark.session import get_spark

    load_before = read_loadavg()
    spark = get_spark(
        f"bench-isolated-{key}",
        master=f"local[{CPUS}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(CPUS), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spec = registry()[key]
    spec.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        spec.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    spark.stop()
    # Per-key stamp only — by the 2nd key the 1-minute average includes
    # the tool's OWN just-stopped JVM, so the anchor-grade warning is
    # decided once at tool start (main), on a reading no local work has
    # polluted yet.
    return {
        "median": statistics.median(times),
        "reps": times,
        "loadavg_before": load_before,
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_ISOLATED.json"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    keys = sys.argv[3].split(",") if len(sys.argv) > 3 else DEFAULT_KEYS
    start_load = read_loadavg()
    ambient_warning = None
    if start_load > LOADAVG_WARN:
        ambient_warning = (
            f"loadavg {start_load} > {LOADAVG_WARN} at tool start with no "
            "local consumer — these medians are NOT anchor-grade; re-take "
            "on a quiet box (the r16 steal-inflated-retake lesson)"
        )
        print(f"WARNING: {ambient_warning}", file=sys.stderr)
    results: dict[str, dict] = {}
    for key in keys:
        r = run_one(key, reps)
        results[key] = r
        print(f"{key:28s} median={r['median']:.3f}s {r['reps']}", flush=True)
    doc = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "reps": reps,
        "loadavg_start": start_load,
        "loadavg_warn_threshold": LOADAVG_WARN,
        "results": results,
    }
    if ambient_warning:
        doc["ambient_warning"] = ambient_warning
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
