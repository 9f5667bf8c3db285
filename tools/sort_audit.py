#!/usr/bin/env python
"""Sort-demotion audit: for every registry key, flag aggregates that
fell from HashAggregate to a SORTED SortAggregate.

HashAggregate requires every aggregation BUFFER to be fixed-width
(mutable primitive); one min(struct(...)), min(string)-with-grouping,
or collect-style buffer demotes the whole query's aggregate to
SortAggregate, which inserts a full Sort of the aggregate's INPUT —
n log n over the fact instead of a hash table. Round-14 caught two
real cases this way (table_profile's min/max(string) sharing the
multi-distinct Expand query: x6.8; pq_encode's min(struct) argmin:
x2 at 10x embeddings). A keyless SortAggregate (no grouping) needs no
Sort and is benign — it is not flagged.

Usage: python tools/sort_audit.py [out.json] [key1,key2,...]
Exit 1 if any key is flagged (CI-able).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sort_audit.json"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    from odl_etl_spark.session import get_spark
    from odl_etl_spark.queries import registry

    spark = get_spark(
        "sort-audit",
        master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    flagged: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name, q in registry().items():
        if only and name not in only:
            continue
        try:
            df = q.build(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover — diagnostic tool
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            continue
        # A grouped SortAggregate requires a Sort child; match a
        # SortAggregate whose subtree shows a Sort within a few lines.
        hits = len(
            re.findall(r"SortAggregate\(key=\[[^\]]", plan)
        )
        if hits and "+- Sort " in plan:
            flagged[name] = hits
            print(f"{name}: {hits} grouped SortAggregate(s)", flush=True)
    with open(out_path, "w") as f:
        json.dump({"flagged": flagged, "errors": errors}, f, indent=1)
    print(f"{len(flagged)} keys flagged -> {out_path}")
    spark.stop()
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
