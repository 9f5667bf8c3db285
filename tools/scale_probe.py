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

# Probe datasets: tag -> replication factor. sf10p (100x sf0.1, round 13)
# extends the ladder to TWO decades so scaling exponents come from a fit,
# not one ratio — and its 60M-row lineitem sits PAST the int64 money-sum
# ceiling (~10.17M rows), so the Q1-shape keys exercise the DECIMAL(38,0)
# widened accumulators live rather than only in a forced unit test.
# sf100p (round 14) adds the THIRD decade — 1000x sf0.1, a 600M-row
# lineitem / 150M-row orders — for the shuffle-light flagship keys, so
# the scaling exponent comes from a 3-point fit. Core tables only (the
# text/embedding corpora are not probed at this tag).
TAG_FACTORS = {"sf0.1p": 1, "sf1p": FACTOR, "sf10p": 100, "sf100p": 1000}
CORE_TABLES = "region nation customer supplier part orders lineitem".split()

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
    # Fan the base table out BEFORE the multiplying crossJoin: the sf0.1
    # sources are single-split files, so without this the factor-N
    # output writes through ~1-3 tasks (observed: the sf100p lineitem
    # write crawling on 3 of 32 cores). Shuffling the BASE rows is
    # cheap (<=11 MB); the replicated rows never shuffle.
    out = df.repartition(32).crossJoin(F.broadcast(reps))
    r = F.col("_r")
    for k in _KEY_COLS.get(name, []):
        out = out.withColumn(k, (F.col(k) * factor + r).cast("bigint"))
    if name == "documents":
        # Suffix a per-replica salt onto every word EXCEPT the ~30
        # gate-bearing function words (curation stopwords + language
        # profiles) — all replicas, including the factor=1 baseline, so
        # every replica has the same per-row shape. Salted shingles map
        # bijectively onto the original corpus' shingles (within-replica
        # near-dup structure isomorphic to sf0.1, cross-replica overlap
        # ~zero), while stopword_ratio / predicted_lang / n_words are
        # UNCHANGED, so the curation funnel's quality and language gates
        # see identical statistics in every replica. The protected-only
        # shingle subset is replica-invariant, so cross-replica
        # contamination probability is scale-invariant too — every
        # funnel stage scales linearly by construction. (Salting every
        # word was tried first and zeroed stopword_ratio: 100% of probe
        # docs became quality rejects and the dedup stages ran on an
        # empty corpus.)
        from odl_etl_spark.functions.text import LANG_PROFILES
        from odl_etl_spark.pipelines.curation import _STOPS

        protected = sorted(
            set(_STOPS) | {w for ws in LANG_PROFILES.values() for w in ws}
        )
        prot = F.array(*[F.lit(w) for w in protected])
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda t: F.when(
                    (t == "") | F.array_contains(prot, F.lower(t)), t
                ).otherwise(F.concat(t, F.lit("q"), r.cast("string"), F.lit("z"))),
            ),
            " ",
        )
        out = out.withColumn("text", salted)
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


def gen(
    spark: SparkSession,
    tags: list[str] | None = None,
    tables: list[str] | None = None,
) -> None:
    tables = tables or (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    )
    for tag in tags or ["sf0.1p", "sf1p"]:
        factor = TAG_FACTORS[tag]
        out_dir = os.path.join(ROOT, tag)
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        for t in tables:
            _replicate(spark, t, factor).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{t}.parquet")
            )
        print(f"wrote {out_dir}", flush=True)


def run(
    spark: SparkSession,
    keys: list[str] | None = None,
    tags: tuple[str, ...] = ("sf0.1p", "sf1p"),
) -> dict:
    from odl_etl_spark.queries import registry

    specs = registry()
    result: dict[str, dict[str, float]] = {}
    for tag in tags:
        sf_dir = os.path.join(ROOT, tag)
        for name in keys or PROBE_KEYS:
            q = specs[name]
            q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            result.setdefault(name, {})[tag] = dt
            print(f"{tag} {name}: {dt}s", flush=True)
    # Per-decade ratios between adjacent measured tags (10x data per step).
    for name, row in result.items():
        for lo, hi in zip(tags, tags[1:]):
            row[f"ratio_{hi}/{lo}"] = round(row[hi] / max(row[lo], 1e-9), 2)
        if "sf1p" in row and "sf0.1p" in row:
            row["ratio"] = row["ratio_sf1p/sf0.1p"]  # legacy field name
    return result


def curation(spark: SparkSession) -> dict:
    """Drive the end-to-end curation DAG at probe scale (VERDICT r5 #6):
    same funnel at sf0.1p and sf1p, recording per-stage attrition counts
    and wall time. The salted-replica construction keeps within-replica
    dup/contamination structure isomorphic to sf0.1, so every stage's
    count should scale ~linearly (ratio ≈ FACTOR) and the wall-time
    ratio bounds the DAG's scaling exponent.

    Two decontamination widths per scale: n=3 (the default — on this
    tiny-vocabulary synthetic corpus it contaminates ~everything, so it
    probes the funnel's reject path at full volume) and n=5 (realistic
    survivor mix, so the partitioned write stage runs over a real
    survivor set too)."""
    from odl_etl_spark.pipelines.curation import curate_corpus

    out: dict[str, dict] = {}
    for n in (3, 5):
        for tag in ("sf0.1p", "sf1p"):
            sf_dir = os.path.join(ROOT, tag)
            dest = os.path.join(ROOT, f"curated_{tag}_n{n}")
            shutil.rmtree(dest, ignore_errors=True)
            t0 = time.perf_counter()
            _, funnel = curate_corpus(spark, sf_dir, dest, decontam_shingle_n=n)
            stages = {r["stage"]: r["n_docs"] for r in funnel.collect()}
            out[f"{tag}_n{n}"] = {
                "stages": stages,
                "total_docs": sum(stages.values()),
                "seconds": round(time.perf_counter() - t0, 1),
            }
            print(f"{tag}_n{n}: {out[f'{tag}_n{n}']}", flush=True)
        lo, hi = out[f"sf0.1p_n{n}"], out[f"sf1p_n{n}"]
        out[f"stage_count_ratios_n{n}"] = {
            s: round(hi["stages"].get(s, 0) / max(lo["stages"].get(s, 1), 1), 2)
            for s in lo["stages"]
        }
        out[f"wall_ratio_n{n}"] = round(hi["seconds"] / lo["seconds"], 2)
    return out


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
        gen(spark, sys.argv[2].split(",") if len(sys.argv) > 2 else None)
    elif cmd == "gen-core":
        # Third-decade tag: core TPC-H tables only (disk + time bound).
        gen(spark, sys.argv[2].split(",") if len(sys.argv) > 2 else ["sf100p"],
            tables=CORE_TABLES)
    elif cmd == "run":
        keys = sys.argv[2].split(",") if len(sys.argv) > 2 else None
        tags = tuple(sys.argv[3].split(",")) if len(sys.argv) > 3 else ("sf0.1p", "sf1p")
        print(json.dumps(run(spark, keys, tags)))
    elif cmd == "curation":
        print(json.dumps(curation(spark)))
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
