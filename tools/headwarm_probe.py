#!/usr/bin/env python
"""Suite-position warm-up artifact: cause isolation + preamble A/B.

SCALING.md round-13 demonstrated that the first ~30 suite positions of
a fresh-JVM bench read 1.3-2x hot regardless of WHICH keys sit there
(the r13 rotation moved different keys to the head and the artifact
followed the positions, not the keys). Hypothesis: what warms over the
first positions is SHARED JVM infrastructure — the Janino codegen
compiler, parquet reader, shuffle writer, Tungsten sort — not
key-specific generated classes (whole-stage codegen emits a fresh class
per plan, so per-key warm-up reps cannot be the mechanism; they are
already in the methodology).

Experiment: two fresh sessions, identical key set K = the 10
alphabetically-first registry keys (the keys that sit at the measured
hot positions under bench.py's canonical order).

  control:  fresh JVM -> bench-methodology timing of K
            (per-key 1 untimed warm-up + 3 timed reps, median)
  treated:  fresh JVM -> UNTIMED preamble (a fixed 12-key diverse
            sample spanning scan/agg/join/window/text/pandas surfaces,
            one rep each) -> identical timing of K

If treated medians land at mid-suite levels (the artifact's ~15-40%
head premium gone), a cheap preamble (~30-60s) buys order-independent
per-key suite numbers and bench.py should adopt it; if not, the
artifact is key-local JIT and only more reps would help.

Usage: python tools/headwarm_probe.py control|treated
(one mode per process — the point is a FRESH JVM per arm; run arms
back-to-back on an idle machine, ideally interleaved A/B/A/B across
several repetitions to average ambient drift)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Diverse shared-infrastructure sample: parquet scan, hash agg, SMJ +
# broadcast joins, window sort, regex/text, HOF array math, Arrow batch.
PREAMBLE = [
    "scan_pruned",
    "agg_having",
    "join_semi",
    "join_anti",
    "win_first_last",
    "text_quality",
    "scalar_array",
    "scalar_json",
    "set_intersect",
    "udf_scalar_pandas",
    "sort_limit",
    "sql_tpch_q12",
]


def main() -> None:
    mode = sys.argv[1]
    assert mode in ("control", "treated"), mode

    from odl_etl_spark.queries import registry
    from odl_etl_spark.session import get_spark

    spark = get_spark(
        "odl-etl-headwarm",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    head = sorted(specs)[:10]

    t_pre = 0.0
    if mode == "treated":
        t0 = time.perf_counter()
        for name in PREAMBLE:
            specs[name].build(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        t_pre = round(time.perf_counter() - t0, 3)

    out: dict[str, float] = {}
    for name in head:
        q = specs[name]
        q.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            q.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(runs), 3)

    print(
        json.dumps(
            {
                "mode": mode,
                "preamble_seconds": t_pre,
                "head_total": round(sum(out.values()), 3),
                "timings": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
