#!/usr/bin/env python
"""LSH band-join skew probe (VERDICT r17 next-round #4, guide §2.5).

``minhash_lsh_pairs`` self-joins the banded signature table on
(_band, _bh). A degenerate corpus (many near-identical docs) makes one
band hash hot: a band key with c postings produces ~c²/2 candidate
rows in ONE join partition. This probe measures the band-key frequency
distribution at sf0.1 and at the 10x replica corpus (.scale/sf1p —
build with `python tools/scale_probe.py gen`), reporting the top band
keys' posting share and the implied per-key join work (sum c² vs the
skew-free ideal), so the two-stage salted guard is applied only if the
data says hot (the VERDICT threshold: top band > 1% of postings).

Run:  python tools/skew_lsh_probe.py OUT.json [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(spark, sf_dir: str) -> dict:
    from odl_etl_spark.operators.dedup import _minhash_signatures, _shingle_hashes

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    banded = _minhash_signatures(
        _shingle_hashes(docs, "doc_id", "text", 3), num_hashes=64, band_size=4
    )
    stats = (
        banded.groupBy("_band", "_bh")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum("c").alias("postings"),
            F.count("*").alias("distinct_keys"),
            F.max("c").alias("max_c"),
            F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
            F.expr("approx_percentile(c, array(0.5, 0.99, 0.999))").alias("pct"),
        )
        .collect()[0]
    )
    top = (
        banded.groupBy("_band", "_bh")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc())
        .limit(10)
        .collect()
    )
    postings = stats["postings"]
    return {
        "sf_dir": sf_dir,
        "postings": postings,
        "distinct_band_keys": stats["distinct_keys"],
        "max_band_count": stats["max_c"],
        "top1_share": round(stats["max_c"] / postings, 6),
        "sum_c2": stats["sum_c2"],
        # skew-free ideal: every key at mean multiplicity
        "sum_c2_ideal": round(postings**2 / stats["distinct_keys"], 1),
        "pct_c_50_99_999": [float(x) for x in stats["pct"]],
        "top10": [
            {"band": r["_band"], "bh": r["_bh"], "c": r["c"]} for r in top
        ],
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/SKEW_LSH_r18.json"
    dirs = sys.argv[2:] or [
        "/root/testdata/sf0.1",
        os.path.join(REPO, ".scale", "sf1p"),
    ]
    from odl_etl_spark.session import get_spark

    spark = get_spark(
        "skew-lsh-probe",
        master=f"local[{CPUS}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(CPUS), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"probes": []}
    for d in dirs:
        if not os.path.isdir(d):
            out["probes"].append({"sf_dir": d, "skipped": "missing"})
            continue
        rec = probe(spark, d)
        out["probes"].append(rec)
        print(json.dumps(rec), flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
