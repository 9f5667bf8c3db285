"""QuerySpec: one declared operator = one driver-checkable query.

Each spec pairs a Spark DataFrame builder with the equivalent DuckDB SQL
(the differential oracle). Conventions that make the order-insensitive
value hash match across engines (SURVEY.md §5.2):

  * alias every computed column identically on both sides;
  * ``ROUND(double_agg, 2)`` on both sides;
  * deterministic total order (unique tie-break key) before any LIMIT;
  * ``events.ts`` is ns in Parquet — Spark truncates to µs in the loader,
    the oracle uses ``CAST(ts AS TIMESTAMP)``;
  * emit dates/windows as DATE or formatted strings, never raw timestamps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL, or None for rows-only checks
    doc: str = ""


def spec(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a builder function as a QuerySpec."""

    def wrap(fn: Builder) -> QuerySpec:
        return QuerySpec(name=name, build=fn, oracle=oracle, doc=doc or fn.__doc__ or "")

    return wrap
