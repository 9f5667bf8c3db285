"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``odl_etl_spark.queries.registry()`` — each declared
operator (SURVEY.md §2B) is a QuerySpec pairing a Spark DataFrame builder
with its DuckDB oracle SQL, so names/aliases can't drift between the two.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from odl_etl_spark.queries import registry
from odl_etl_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's salted-SHA256 user map
    (email_mapping.py:49-51) as a distributed codegen'd expression."""
    tune_session(spark)
    return registry()["project_hash_email"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""

    def _wrap(s):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return s.build(spark, sf_dir)

        run.__doc__ = s.doc
        return run

    return {name: _wrap(s) for name, s in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted → rows-only check)."""
    return {
        name: s.oracle for name, s in registry().items() if s.oracle is not None
    }
