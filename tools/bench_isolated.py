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


def run_one(key: str, reps: int) -> dict:
    from odl_etl_spark.queries import registry
    from odl_etl_spark.session import get_spark

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
    return {"median": statistics.median(times), "reps": times}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_ISOLATED.json"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    keys = sys.argv[3].split(",") if len(sys.argv) > 3 else DEFAULT_KEYS
    results: dict[str, dict] = {}
    for key in keys:
        r = run_one(key, reps)
        results[key] = r
        print(f"{key:28s} median={r['median']:.3f}s {r['reps']}", flush=True)
    with open(out_path, "w") as f:
        json.dump(
            {"sf_dir": SF_DIR, "cpus": CPUS, "reps": reps, "results": results},
            f,
            indent=1,
        )


if __name__ == "__main__":
    main()
