#!/usr/bin/env python
"""Broadcast audit: for every registry key, walk the optimized physical
plan and report each BroadcastExchange whose subtree scans a FACT table
(orders / lineitem / events / documents / embeddings) with no
cardinality-bounding operator (aggregate / limit / window-group-limit)
between the scan and the broadcast. Those are the candidates for the
round-9 finding (SCALING.md): a broadcast the stats chose at bench sf
that grows with the corpus and cannot survive 100x.

Dim-table broadcasts (region/nation/customer/supplier/part) and
aggregated/limited subtrees are the INTENDED pattern and are not
flagged. The report is reviewed by hand — an aggregate does not always
bound cardinality (groupBy on a high-cardinality key), and some flagged
sites are 1-row scalar attaches the walker cannot prove bounded.

Usage: python tools/broadcast_audit.py [out.json] [key1,key2,...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from odl_etl_spark.plans.inspect import audit_fact_broadcasts  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/broadcast_audit.json"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    from odl_etl_spark.session import get_spark
    from odl_etl_spark.queries import registry

    spark = get_spark("broadcast-audit", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    report: dict[str, list] = {}
    errors: dict[str, str] = {}
    for name, spec in registry().items():
        if only and name not in only:
            continue
        try:
            df = spec.build(spark, sf_dir)
            flags = audit_fact_broadcasts(df)
            if flags:
                report[name] = flags
            print(f"{name}: {len(flags)} flag(s)", flush=True)
        except Exception as e:  # pragma: no cover - diagnostic tool
            errors[name] = str(e)[:200]
            print(f"{name}: ERROR {e}", flush=True)
    with open(out_path, "w") as f:
        json.dump({"flagged": report, "errors": errors}, f, indent=1)
    print(f"\n{len(report)} keys flagged -> {out_path}")


if __name__ == "__main__":
    main()
