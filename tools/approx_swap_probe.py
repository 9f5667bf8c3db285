#!/usr/bin/env python
"""Measure the documented approximate swap-ins at the decade where they
matter (VERDICT r14, next-round #3): exact COUNT(DISTINCT) vs the HLL
lane on the sf100p probe tables (600M-row lineitem).

Two forms per probed key, same grouping, warm (one untimed build+run,
then N timed reps through the noop sink), plus a driver-side accuracy
pass comparing per-group estimates against the exact counts — the
latency/accuracy trade the docs promise becomes a measured table.

Probed swaps:
  * agg_distinct        -> approx_count_distinct(rsd=0.05)  [the 141.9 s
    sf100p motivation, VERDICT r14]
  * events_active_users-style custkey NDV per month over orders ->
    approx_count_distinct   (events table is absent at sf100p; the
    orders month-NDV form is the same shape: high-cardinality NDV per
    time bucket)

Usage: python tools/approx_swap_probe.py [sf_dir] [out.json] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def timed(df, reps):
    df.write.format("noop").mode("overwrite").save()  # warm
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 2))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf100p"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "APPROX_SWAP_r15.json"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from odl_etl_spark.session import get_spark

    spark = get_spark(
        "approx-swap-probe",
        master=f"local[{os.cpu_count() or 8}]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    l = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))

    results: dict[str, dict] = {}

    # --- swap 1: agg_distinct (two exact NDVs per returnflag) ---------
    exact1 = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )
    approx1 = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey", 0.05).alias("n_supps"),
        F.approx_count_distinct("l_partkey", 0.05).alias("n_parts"),
        F.count("*").alias("n_rows"),
    )
    results["agg_distinct"] = {
        "exact_s": timed(exact1, reps),
        "approx_s": timed(approx1, reps),
    }

    # --- swap 2: month-bucketed custkey NDV over orders ---------------
    month = F.date_trunc("month", "o_orderdate").alias("month")
    exact2 = o.groupBy(month).agg(
        F.countDistinct("o_custkey").alias("active")
    )
    approx2 = o.groupBy(month).agg(
        F.approx_count_distinct("o_custkey", 0.05).alias("active")
    )
    results["month_active_custkeys"] = {
        "exact_s": timed(exact2, reps),
        "approx_s": timed(approx2, reps),
    }

    # --- swap 2's documented remedy (VERDICT r15 #5): rsd=0.025 -------
    # The r15 row's honest tail note was a 12.4% worst-group error at
    # rsd=0.05; halving rsd quadruples the HLL register count for a
    # hard ~10% bound. Same exact lane, tighter approx lane — the
    # remedy becomes a measured (latency, error) point, not prose.
    approx2t = o.groupBy(month).agg(
        F.approx_count_distinct("o_custkey", 0.025).alias("active")
    )
    results["month_active_custkeys_rsd025"] = {
        "exact_s": timed(exact2, reps),
        "approx_s": timed(approx2t, reps),
    }

    # --- accuracy: per-group relative error of every estimate ---------
    for name, ex_df, ap_df, keys, vals in (
        ("agg_distinct", exact1, approx1, ["l_returnflag"], ["n_supps", "n_parts"]),
        ("month_active_custkeys", exact2, approx2, ["month"], ["active"]),
        ("month_active_custkeys_rsd025", exact2, approx2t, ["month"], ["active"]),
    ):
        ex = {tuple(str(r[k]) for k in keys): r for r in ex_df.collect()}
        ap = {tuple(str(r[k]) for k in keys): r for r in ap_df.collect()}
        errs = []
        for g, er in ex.items():
            for v in vals:
                e, a = er[v], ap[g][v]
                errs.append(abs(a - e) / max(e, 1))
        rec = results[name]
        rec["groups"] = len(ex)
        rec["estimates"] = len(errs)
        rec["max_rel_err"] = round(max(errs), 4)
        rec["mean_rel_err"] = round(sum(errs) / len(errs), 4)
        rec["speedup_median"] = round(
            sorted(rec["exact_s"])[len(rec["exact_s"]) // 2]
            / max(sorted(rec["approx_s"])[len(rec["approx_s"]) // 2], 1e-9),
            2,
        )
        print(name, rec, flush=True)

    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "rsd": 0.05, "results": results}, f, indent=1)
    print(f"-> {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
