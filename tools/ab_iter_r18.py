#!/usr/bin/env python
"""Interleaved same-session A/B for the r18 iterative-loop restructures
(VERDICT r17 next-round #1): connected_components single-materialize
explode-symmetrize, and pagerank_fixed explode-symmetrize (+ the
dropDuplicates-vs-distinct adjudication the verdict asked for).

Arms are KEY-LEVEL (the registry specs the driver times), with the old
r17 operator bodies reconstructed inline and monkeypatched into
odl_etl_spark.operators.{components,pagerank} per run. Interleaved
A/B/A/B... in one JVM (ambient-robust, the CC_SEED_AB_r17 pattern);
each arm also records its Spark job count (load-independent) and an
md5 checksum over the sorted collected rows (output-identity proof).

Run:  python tools/ab_iter_r18.py OUT.json [pairs]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from odl_etl_spark.operators import components as C
from odl_etl_spark.operators import pagerank as P
from odl_etl_spark.operators.materialize import materialize
from odl_etl_spark.pipelines import curation as CUR
from odl_etl_spark.queries import graph as G

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


# ---- r17 operator bodies (reconstructed from git bc6aac7) ----------------

def cc_r17(edges, src="src", dst="dst", max_iter=50):
    e = materialize(edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v")))
    sym = materialize(
        e.unionByName(
            e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
        ).repartition(F.col("_u"))
    )
    labels = materialize(
        sym.groupBy("_u")
        .agg(F.min("_v").alias("_mn"))
        .select("_u", F.least(F.col("_u"), F.col("_mn")).alias("_label"))
    )
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, "_u")
            .groupBy(F.col("_v").alias("_u"))
            .agg(F.min("_label").alias("_nl"))
        )
        stepped = labels.join(neigh, "_u", "left").select(
            "_u",
            "_label",
            F.least("_label", F.coalesce("_nl", "_label")).alias("_new"),
        )
        stepped = materialize(stepped)
        if stepped.where(F.col("_new") < F.col("_label")).limit(1).count() == 0:
            break
        labels = stepped.select("_u", F.col("_new").alias("_label"))
    else:
        raise RuntimeError("no fixpoint")
    return stepped.select(F.col("_u").alias("node"), F.col("_new").alias("component"))


def cc_r18b(edges, src="src", dst="dst", max_iter=50):
    """Candidate: adaptive pre-partition + union-self min agg (no per-
    round labels join) + monotone label-sum convergence probe."""
    from odl_etl_spark.operators.components import _fits_broadcast

    sym = materialize(
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("_u"), F.col(dst).alias("_v")),
                    F.struct(F.col(dst).alias("_u"), F.col(src).alias("_v")),
                )
            ).alias("_e")
        ).select("_e._u", "_e._v")
    )
    labels = materialize(
        sym.groupBy("_u")
        .agg(F.min("_v").alias("_mn"))
        .select("_u", F.least(F.col("_u"), F.col("_mn")).alias("_label"))
    )
    if not _fits_broadcast(labels):
        sym = materialize(sym.repartition(F.col("_u")))

    def lsum(df):
        return df.agg(
            F.sum(F.col("_label").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev = lsum(labels)
    for _ in range(max_iter):
        stepped = materialize(
            sym.join(labels, "_u")
            .select(F.col("_v").alias("_u"), "_label")
            .unionByName(labels)
            .groupBy("_u")
            .agg(F.min("_label").alias("_label"))
        )
        cur = lsum(stepped)
        labels = stepped
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError("no fixpoint")
    return labels.select(F.col("_u").alias("node"), F.col("_label").alias("component"))


def pr_r17(edges, src="src", dst="dst", iterations=3):
    from odl_etl_spark.functions.numeric import assert_scaled_sum_headroom

    assert_scaled_sum_headroom(1, 1.0, P.SCALE, what="ab")
    e = materialize(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .repartition(F.col("src"))
        .dropDuplicates(["src", "dst"])
    )
    return _pr_tail(e, iterations)


def pr_r16ish_distinct(edges, src="src", dst="dst", iterations=3):
    """Explode symmetrize + plain distinct() (no pre-partition) — the
    dropDuplicates-vs-distinct adjudication arm."""
    from odl_etl_spark.functions.numeric import assert_scaled_sum_headroom

    assert_scaled_sum_headroom(1, 1.0, P.SCALE, what="ab")
    e = materialize(
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("src"), F.col(dst).alias("dst")),
                    F.struct(F.col(dst).alias("src"), F.col(src).alias("dst")),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .distinct()
    )
    return _pr_tail(e, iterations)


def _pr_tail(e, iterations):
    deg = materialize(e.groupBy("src").agg(F.count("*").alias("outdeg")))
    nodes = deg.select(F.col("src").alias("node"))
    n = nodes.count()
    base = (P.SCALE - P.SCALE * P.DAMP_NUM // P.DAMP_DEN) // n
    ed = materialize(e.join(deg, "src"))
    r = nodes.withColumn("rank", F.lit(P.SCALE // n))
    for _ in range(iterations):
        s = (
            ed.join(r, ed["src"] == r["node"])
            .select(
                F.col("dst"),
                F.floor(F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        r = s.select(
            F.col("dst").alias("node"),
            (F.lit(base) + F.floor(F.col("s") * P.DAMP_NUM / P.DAMP_DEN))
            .cast("bigint")
            .alias("rank"),
        )
        r = materialize(r)
    return r


# ---- harness --------------------------------------------------------------

def _patch(is_pr: bool, fn) -> None:
    """Rebind the operator in EVERY namespace that imported it at module
    load (curation.py / graph.py); text.py and compose.py import inside
    their build functions and resolve through the operator module."""
    if is_pr:
        P.pagerank_fixed = fn
        G.pagerank_fixed = fn
    else:
        C.connected_components = fn
        CUR.connected_components = fn


def checksum(df):
    rows = sorted(map(str, df.collect()))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/AB_ITER_r18.json"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from odl_etl_spark.queries import registry
    from odl_etl_spark.session import get_spark

    spark = get_spark(
        "ab-iter-r18",
        master=f"local[{CPUS}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(CPUS), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    tracker = spark.sparkContext.statusTracker

    def timed(key, tag):
        sc = spark.sparkContext
        sc.setJobGroup(f"ab:{tag}", tag)
        t0 = time.perf_counter()
        specs[key].build(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(f"ab:{tag}"))
        sc.setJobGroup("other", "other")
        return round(dt, 3), jobs

    arms = {
        "dedup_cluster": [
            ("r17", cc_r17),
            ("r18a", C.connected_components),
            ("r18b", cc_r18b),
        ],
        "dedup_cluster_incremental": [
            ("r17", cc_r17),
            ("r18a", C.connected_components),
            ("r18b", cc_r18b),
        ],
        "corpus_curation_funnel": [
            ("r17", cc_r17),
            ("r18a", C.connected_components),
            ("r18b", cc_r18b),
        ],
        "graph_pagerank": [
            ("r17", pr_r17),
            ("r18", P.pagerank_fixed),
        ],
    }
    new_cc = C.connected_components
    new_pr = P.pagerank_fixed
    results: dict = {"sf_dir": SF_DIR, "cpus": CPUS, "pairs": pairs, "keys": {}}
    results["loadavg_start"] = open("/proc/loadavg").read().split()[:3]

    for key, variants in arms.items():
        is_pr = key == "graph_pagerank"
        rec = {v[0]: {"times": [], "jobs": [], "checksum": None} for v in variants}
        # warm-up once with the new code
        timed(key, f"warm:{key}")
        for p in range(pairs):
            # Order-balanced (ABC / CBA alternating): a monotone ambient
            # drift within the session cannot bias one arm.
            order = variants if p % 2 == 0 else list(reversed(variants))
            for tag, fn in order:
                _patch(is_pr, fn)
                dt, jobs = timed(key, f"{key}:{tag}:{p}")
                rec[tag]["times"].append(dt)
                rec[tag]["jobs"].append(jobs)
        # restore + checksums (one per arm)
        for tag, fn in variants:
            _patch(is_pr, fn)
            rec[tag]["checksum"] = checksum(specs[key].build(spark, SF_DIR))
        _patch(False, new_cc)
        _patch(True, new_pr)
        import statistics

        for tag in rec:
            rec[tag]["median"] = round(statistics.median(rec[tag]["times"]), 3)
        results["keys"][key] = rec
        print(json.dumps({key: rec}), flush=True)

    results["loadavg_end"] = open("/proc/loadavg").read().split()[:3]
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
