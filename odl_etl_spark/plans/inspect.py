"""Physical-plan inspection: make the scale posture assertable.

The engine writes zero planner code (SURVEY §4.2) — correctness of the
*plan shape* is still a contract: filters must reach the parquet reader,
small dims must broadcast, aggregates must partial-combine before the
exchange, and a query should carry no more shuffles than its semantics
require. These helpers parse ``explain`` output so tests can pin those
properties; a regression that, say, un-broadcasts a dim join fails CI
instead of becoming a 100 TB incident.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if every fragment appears in a PushedFilters list."""
    plan = explain_str(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[(.*?)\]", plan))
    return all(f in pushed for f in fragments)


def pruned_columns(df: DataFrame) -> set[str]:
    """Columns actually read from the scan (union over ReadSchema entries)."""
    plan = explain_str(df)
    cols: set[str] = set()
    for schema in re.findall(r"ReadSchema: struct<(.*?)>", plan):
        for field in schema.split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Partial (map-side) aggregation before the exchange — the property
    that makes low-cardinality groupBys move KBs instead of TBs."""
    return "partial_" in explain_str(df)


FACT_TABLES = ("orders", "lineitem", "events", "documents", "embeddings")

_CARDINALITY_BOUNDING = (
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
    "TakeOrderedAndProject",
    "WindowGroupLimit",
)


def _tree_lines(plan: str) -> list[str]:
    """The indented operator-tree section of a formatted explain."""
    return plan.split("\n\n")[0].splitlines()


def _tree_depth(line: str) -> int:
    """Tree depth by indentation of the operator glyph."""
    for i, ch in enumerate(line):
        if ch not in " :+-*(":
            return i
    return len(line)


def audit_fact_broadcasts(
    df: DataFrame, facts: tuple[str, ...] = FACT_TABLES
) -> list[dict]:
    """Flag BroadcastExchange subtrees that scan a fact table with no
    cardinality-bounding operator between the scan and the broadcast.

    This is the round-9 hazard class (SCALING.md): the planner's size
    estimate for a DERIVED relation (window / explode / UDF output over
    a fact scan) does not track the data, so a broadcast it chooses at
    bench sf grows with the corpus and OOMs at 100 TB. Dim-table
    broadcasts and aggregated/limited subtrees are the intended pattern
    and are not flagged. A HashAggregate does not always bound
    cardinality (groupBy on a high-cardinality key still scales with
    the input), so a clean audit is necessary-not-sufficient — but any
    NEW flag is a regression to adjudicate before it ships.
    """
    lines = _tree_lines(explain_str(df))
    flags = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = _tree_depth(line)
        subtree = []
        for nxt in lines[i + 1 :]:
            if nxt.strip() and _tree_depth(nxt) <= d:
                break
            subtree.append(nxt)
        scans = [
            f for f in facts if any("Scan" in s and f in s for s in subtree)
        ]
        if not scans:
            continue
        bounded = any(
            b in s for s in subtree for b in _CARDINALITY_BOUNDING
        )
        if not bounded:
            flags.append({"broadcast_line": line.strip(), "facts": scans})
    return flags


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (before AQE re-planning).
    Counts formatted-mode Exchange nodes whose detail is hash/range
    partitioning (broadcast exchanges are not shuffles)."""
    plan = explain_str(df)
    n = 0
    for m in re.finditer(r"\((\d+)\) Exchange\n(?:Input.*\n)?Arguments: (\w+)", plan):
        if m.group(2) in ("hashpartitioning", "rangepartitioning"):
            n += 1
    return n
