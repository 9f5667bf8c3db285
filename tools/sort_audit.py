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
Exit 1 if any key is flagged; exit 2 if any key ERRORED during build
(ADVICE r14 #2 — a green exit must mean every key was actually
audited, not that broken keys were skipped).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _node_indent_and_text(line: str) -> tuple[int, str]:
    """Split a physical-plan tree line into (indent of node text, node
    text). Tree-drawing prefixes are spaces, ':', '+', '-'; the node
    text may additionally carry a WholeStageCodegen ``*(n) `` marker,
    which is stripped so child-kind checks see the operator name."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    text = re.sub(r"^\*\(\d+\) ", "", line[i:])
    return i, text


def _demoted_sort_aggregates(plan: str) -> int:
    """Count grouped SortAggregates whose DIRECT CHILD in the plan tree
    is a Sort — i.e. aggregates that forced a sort of their input."""
    lines = plan.splitlines()
    parsed = [_node_indent_and_text(ln) for ln in lines]
    hits = 0
    for i, (indent, text) in enumerate(parsed):
        if not re.match(r"SortAggregate\(key=\[[^\]]", text):
            continue
        for child_indent, child_text in parsed[i + 1 :]:
            if not child_text:
                continue
            if child_indent <= indent:
                break  # left the subtree without meeting a child
            # First strictly-deeper node line = the direct child.
            if child_text.startswith("Sort "):
                hits += 1
            break
    return hits


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
        # Flag a grouped SortAggregate only when ITS OWN direct child is
        # a Sort (ADVICE r14 #2): a Sort elsewhere in the plan (an
        # orderBy, an SMJ side) must not implicate an unrelated grouped
        # SortAggregate, and a grouped SortAggregate fed by
        # already-sorted input inserts no extra Sort and is benign.
        hits = _demoted_sort_aggregates(plan)
        if hits:
            flagged[name] = hits
            print(f"{name}: {hits} grouped SortAggregate(s)", flush=True)
    with open(out_path, "w") as f:
        json.dump({"flagged": flagged, "errors": errors}, f, indent=1)
    print(f"{len(flagged)} keys flagged, {len(errors)} errored -> {out_path}")
    spark.stop()
    # Flagged demotions beat build errors for exit priority; either way a
    # nonzero exit — CI green must mean "all keys audited, none demoted".
    sys.exit(1 if flagged else (2 if errors else 0))


if __name__ == "__main__":
    main()
