"""Per-stage wall breakdown of `corpus_curation_funnel` (VERDICT r8 #2).

The funnel is the suite's heaviest key and moved 7.47s -> 11.40s across
rounds with no code change; its isolated fresh-session median
(tools/bench_isolated.py) decides whether the move is real, and THIS
script decides where the time goes. Each probe materializes one stage
PREFIX of the DAG through the noop sink in a fresh-enough session (one
shared session, each probe re-built from source so no cache leaks);
stage cost = delta between consecutive prefixes. The stage construction
mirrors pipelines/curation.py's public-operator composition.

Run:  python tools/curation_profile.py [reps]
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


def build_prefixes(spark):
    """Ordered (name, thunk) list; each thunk builds one DAG prefix of
    the funnel, matching pipelines/curation.py stage for stage."""
    from pyspark.sql import Window

    from odl_etl_spark.functions import text as T
    from odl_etl_spark.io.sources import load_table, spread
    from odl_etl_spark.operators.components import connected_components
    from odl_etl_spark.operators.dedup import minhash_lsh_pairs
    from odl_etl_spark.pipelines.curation import _STOPS
    from odl_etl_spark.queries import registry
    from pyspark.sql import functions as F

    def gates():
        d = spread(load_table(spark, SF_DIR, "documents"))
        corpus = d.where(F.col("source") != "src0")
        toks = T.tokens("text")
        quality_ok = (
            (F.size(toks) >= 20)
            & (T.mean_token_len("text") <= 12)
            & (T.stopword_ratio("text", _STOPS) >= 0.003)
        )
        lang_ok = T.predicted_lang("text") == F.lit("en")
        return corpus.select(
            "doc_id",
            "text",
            "lang",
            "source",
            F.coalesce(quality_ok, F.lit(False)).alias("_q"),
            F.coalesce(lang_ok, F.lit(False)).alias("_l"),
        ).where(F.col("_q") & F.col("_l"))

    def exact():
        wex = Window.partitionBy(F.xxhash64(F.trim(F.lower("text")))).orderBy(
            "doc_id"
        )
        return (
            gates()
            .withColumn("_rn", F.row_number().over(wex))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def lsh_pairs():
        return minhash_lsh_pairs(exact(), "doc_id", "text", threshold=0.8)

    def components():
        return connected_components(lsh_pairs(), src="id_a", dst="id_b")

    def full():
        return registry()["corpus_curation_funnel"].build(spark, SF_DIR)

    return [
        ("gates", gates),
        ("exact_dedup", exact),
        ("lsh_pairs", lsh_pairs),
        ("components", components),
        ("full_funnel", full),
    ]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from odl_etl_spark.session import get_spark

    spark = get_spark(
        "curation-profile",
        master=f"local[{CPUS}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(CPUS), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    prev = 0.0
    for name, thunk in build_prefixes(spark):
        thunk().write.format("noop").mode("overwrite").save()  # warm-up
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            thunk().write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        med = statistics.median(times)
        out[name] = {
            "prefix_median": round(med, 3),
            "stage_delta": round(med - prev, 3),
            "reps": times,
        }
        prev = med
        print(
            f"{name:14s} prefix={med:7.3f}s delta={out[name]['stage_delta']:7.3f}s"
            f" {times}",
            flush=True,
        )
    with open("CURATION_PROFILE.json", "w") as f:
        json.dump({"sf_dir": SF_DIR, "reps": reps, "stages": out}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
