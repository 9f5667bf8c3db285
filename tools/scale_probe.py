#!/usr/bin/env python
"""sf1 scale probe (VERDICT.md r4, Next-round #6): empirically check the
100×-posture claims by timing the heaviest registry keys at 10× the
bench scale and recording s/query scaling vs the sf0.1-shaped baseline.

Usage:
    python tools/scale_probe.py gen   # build .scale/sf0.1p and .scale/sf1p
    python tools/scale_probe.py run   # time the probe keys, print JSON

Methodology — replication with key remapping, probe-only data (the
driver's /root/testdata is read-only and has no sf1):

* Every table is crossed with ``replica r in [0, factor)`` and its
  PK/FK columns remapped ``key*factor + r`` — referential integrity
  holds within each replica, so join/agg cardinalities scale linearly.
* ``documents.text`` gets a per-replica salt token interleaved between
  words in EVERY replica (including the factor=1 baseline, so both
  probe datasets have identical per-row shape): cross-replica shingle
  overlap is zero, and near-dup structure scales linearly instead of
  every doc gaining factor-1 artificial twins (which would measure a
  duplicate explosion, not engine scaling).
* ``embeddings.embedding`` gets a deterministic per-(vec,replica)
  offset for r>0 so replicas are not identical vectors (same rationale).

Both probe dirs live under .scale/ (gitignored); the baseline is
regenerated through the same transform so the ONLY difference is row
count. One rep per key after one warm-up (same noop-sink posture as
bench.py); scaling ratios are what matters, not absolute seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale")
FACTOR = 10

# The ten heaviest keys of BENCH_r04 (sum-of-medians ranking).
PROBE_KEYS = [
    "graph_pagerank",
    "dedup_cluster",
    "dedup_simhash",
    "sink_upsert",
    "dedup_near",
    "events_rfm",
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "agg_exact_median",
    "agg_approx_quantile",
]

_KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _replicate(spark: SparkSession, name: str, factor: int) -> DataFrame:
    df = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
    if name in ("region", "nation"):
        return df  # fixed dims: never scaled, like TPC-H
    reps = spark.range(factor).select(F.col("id").alias("_r"))
    out = df.crossJoin(F.broadcast(reps))
    r = F.col("_r")
    for k in _KEY_COLS.get(name, []):
        out = out.withColumn(k, (F.col(k) * factor + r).cast("bigint"))
    if name == "documents":
        # Suffix a per-replica salt onto EVERY word (all replicas, so
        # the factor=1 baseline has the same per-row shape): shingles
        # map bijectively onto the original corpus' shingles, so
        # within-replica near-dup structure is isomorphic to sf0.1 and
        # cross-replica shingle overlap is zero. (An interleaved salt
        # token was tried first and collapsed every other shingle onto
        # a single-word key — candidate explosion, 6× inflated dedup
        # baselines.)
        repl = F.concat(F.lit("$1q"), r.cast("string"), F.lit("z"))
        out = out.withColumn(
            "text", F.regexp_replace(F.col("text"), F.lit(r"(\S+)"), repl)
        )
        out = out.withColumn("n_chars", F.length("text"))
    if name == "embeddings":
        noise = (
            F.pmod(F.hash(F.col("vec_id"), F.lit(1), r.cast("int")), F.lit(997))
            / 997.0
            - 0.5
        ) * 0.6
        out = out.withColumn(
            "embedding",
            F.when(r == 0, F.col("embedding")).otherwise(
                F.transform(
                    "embedding", lambda x, i: (x + noise + i * F.lit(0.0)).cast("float")
                )
            ),
        )
    return out.drop("_r")


def gen(spark: SparkSession) -> None:
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    for tag, factor in (("sf0.1p", 1), ("sf1p", FACTOR)):
        out_dir = os.path.join(ROOT, tag)
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        for t in tables:
            _replicate(spark, t, factor).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{t}.parquet")
            )
        print(f"wrote {out_dir}", flush=True)


def run(spark: SparkSession, keys: list[str] | None = None) -> dict:
    from odl_etl_spark.queries import registry

    specs = registry()
    result: dict[str, dict[str, float]] = {}
    for tag in ("sf0.1p", "sf1p"):
        sf_dir = os.path.join(ROOT, tag)
        for name in keys or PROBE_KEYS:
            q = specs[name]
            q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            result.setdefault(name, {})[tag] = dt
            print(f"{tag} {name}: {dt}s", flush=True)
    for name, row in result.items():
        row["ratio"] = round(row["sf1p"] / max(row["sf0.1p"], 1e-9), 2)
    return result


def main() -> None:
    from odl_etl_spark.session import get_spark

    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    spark = get_spark(
        "odl-etl-scale-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if cmd == "gen":
        gen(spark)
    elif cmd == "run":
        keys = sys.argv[2].split(",") if len(sys.argv) > 2 else None
        print(json.dumps(run(spark, keys)))
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
