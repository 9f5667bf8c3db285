"""Registry of declared operators (SURVEY.md §2B): name → QuerySpec.

Every spec is one driver-checkable query: the Spark builder and its DuckDB
oracle live side by side so column aliases can never drift apart.
"""

from __future__ import annotations

from odl_etl_spark.queries.base import QuerySpec


def registry() -> dict[str, QuerySpec]:
    # Imports are lazy so a syntax error in one module surfaces at call
    # time with a clean traceback, and pyspark isn't imported on package
    # import for tooling that only wants the names.
    from odl_etl_spark.queries import (
        aggs,
        joins,
        scalars,
        scans,
        setops,
        similarity,
        streaming,
        text,
        windows,
    )

    modules = [scans, scalars, joins, aggs, windows, setops, streaming, text, similarity]
    out: dict[str, QuerySpec] = {}
    for mod in modules:
        for s in mod.SPECS:
            if s.name in out:
                raise ValueError(f"duplicate query key: {s.name}")
            out[s.name] = s
    return out
