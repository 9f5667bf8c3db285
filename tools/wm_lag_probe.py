#!/usr/bin/env python
"""Watermark publication-lag probe — the controlled experiment behind
`stream_late_drop`'s drop rule (SCALING.md round-13).

Claim under test: in the micro-batch engine, event-time stats of batch
k advance the late-row filter only from batch k+2 — one batch to
publish the advanced watermark at batch end, one to plan with it.

Layout (one parquet file per micro-batch, mtime-ordered, 1-hour
tumbling agg with a 1-hour watermark, update mode):

  b0: 10:30                      -> admitted (wm = epoch)
  b1: 13:30                      -> admitted; if the lag were ONE
                                    batch, wm for b2 would be 12:30
  b2: 09:15, 11:15, 12:45        -> ALL admitted  => wm(b2) = 09:30,
                                    i.e. from b0 only (lag 2)
  b3: 09:20, 11:20, 12:50        -> only 12:50 admitted => wm(b3) =
                                    12:30, b1's stats now in force
  b4: 09:25, 11:25, 12:55        -> only 12:55 admitted (steady)

Prints the per-batch admitted sets and PASS/FAIL for the lag-2
signature. Run: python tools/wm_lag_probe.py
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = [
    [(10, 30)],
    [(13, 30)],
    [(9, 15), (11, 15), (12, 45)],
    [(9, 20), (11, 20), (12, 50)],
    [(9, 25), (11, 25), (12, 55)],
]
# Window-start hours expected per emitted batch under the lag-2 rule.
EXPECT = [
    {(10, 1)},
    {(13, 1)},
    {(9, 1), (11, 1), (12, 1)},
    {(12, 2)},
    {(12, 3)},
]


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="wm_lag_probe_")
    try:
        for i, rows in enumerate(BATCHES):
            df = spark.createDataFrame(
                [(dt.datetime(2024, 1, 1, h, m),) for h, m in rows],
                "ts timestamp",
            )
            stage = os.path.join(d, f"_stage{i}")
            df.coalesce(1).write.mode("overwrite").parquet(stage)
            part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
            shutil.move(
                os.path.join(stage, part), os.path.join(d, f"b{i}.parquet")
            )
            os.utime(os.path.join(d, f"b{i}.parquet"), (1_700_000_000 + i,) * 2)
            shutil.rmtree(stage)

        stream = (
            spark.readStream.schema("ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.hour("w.start").alias("wh"), "n")
        )
        got: list[set] = []

        def sink(df, bid):  # noqa: ANN001
            got.append({(r["wh"], r["n"]) for r in df.collect()})

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        ok = got == EXPECT
        for i, (g, e) in enumerate(zip(got, EXPECT)):
            print(f"batch {i}: admitted {sorted(g)}  expected {sorted(e)}")
        print("LAG-2 SIGNATURE:", "PASS" if ok else f"FAIL ({got})")
        sys.exit(0 if ok else 1)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
