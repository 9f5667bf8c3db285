#!/usr/bin/env python
"""Phase decomposition for ann_index_pq_ingest_probe (VERDICT r17
next-round #3): where does the key's time go — codebook train+stamp,
standing-corpus encode materialize, or the append+probe tail?

One fresh session; N interleaved passes, each timing the three phases
separately (the phases are sequential actions inside the key, so their
sum ≈ the key's noop time). Also records the whole-key time per pass.

Run:  python tools/ann_pq_phase_r18.py OUT.json [passes]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ANN_PQ_PHASE_r18.json"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from odl_etl_spark.io.sources import cached_count, load_table, spread
    from odl_etl_spark.operators.ann_index import (
        pq_encode,
        pq_explode,
        pq_index,
        pq_index_append,
        pq_probe,
        pq_r_pool,
    )
    from odl_etl_spark.operators.materialize import materialize
    from odl_etl_spark.queries import registry
    from odl_etl_spark.queries.similarity import _probe_vec
    from odl_etl_spark.session import get_spark

    spark = get_spark(
        "ann-pq-phase-r18",
        master=f"local[{CPUS}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(CPUS), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    key = "ann_index_pq_ingest_probe"
    # warm-up
    specs[key].build(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    rec = {"phases": [], "whole_key": [], "loadavg": []}
    for _ in range(passes):
        rec["loadavg"].append(open("/proc/loadavg").read().split()[0])
        t0 = time.perf_counter()
        probe = _probe_vec(spark, SF_DIR, 0)
        e = load_table(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        cent, _ = pq_index(spread(e), train_stamp=True)
        cent = materialize(cent)
        t1 = time.perf_counter()
        standing = e.where((F.col("vec_id") != 0) & (F.col("vec_id") % 5 != 4))
        arriving = e.where((F.col("vec_id") != 0) & (F.col("vec_id") % 5 == 4))
        stored = materialize(pq_encode(pq_explode(spread(standing)), cent))
        t2 = time.perf_counter()
        appended = pq_index_append(cent, stored, spread(arriving))
        codes = stored.unionByName(appended)
        n_corpus = cached_count(spark, SF_DIR, "embeddings") - 1
        pq_probe(codes, cent, e, probe, pq_r_pool(n_corpus), k=10).write.format(
            "noop"
        ).mode("overwrite").save()
        t3 = time.perf_counter()
        rec["phases"].append(
            {
                "train_cent": round(t1 - t0, 3),
                "encode_stored": round(t2 - t1, 3),
                "append_probe": round(t3 - t2, 3),
                "sum": round(t3 - t0, 3),
            }
        )
        t0 = time.perf_counter()
        specs[key].build(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        rec["whole_key"].append(round(time.perf_counter() - t0, 3))

    rec["whole_key_median"] = round(statistics.median(rec["whole_key"]), 3)
    for ph in ("train_cent", "encode_stored", "append_probe"):
        rec[f"{ph}_median"] = round(
            statistics.median(p[ph] for p in rec["phases"]), 3
        )
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if "median" in k}))
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
