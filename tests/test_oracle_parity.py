"""Local mirror of the driver's differential-oracle gate (SURVEY §5.2).

For every QuerySpec with oracle SQL: run the Spark builder and the DuckDB
SQL on the same parquet tables, then compare column names, row counts, and
an order-insensitive canonicalized row multiset. Floats are compared after
rounding to 6 significant places (the specs themselves already ROUND
aggregates to 2 per convention, so this only absorbs fp representation
noise, not semantic drift).
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pytest

from odl_etl_spark.queries import registry


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)


ORACLED = [s for s in registry().values() if s.oracle is not None]
ROWS_ONLY = [s for s in registry().values() if s.oracle is None]


@pytest.mark.parametrize("q", ORACLED, ids=lambda s: s.name)
def test_oracle_parity(q, spark, duck, sf_dir):
    sdf = q.build(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.execute(q.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{q.name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{q.name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = canon_rows(spark_cols, spark_rows)
    b = canon_rows(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{q.name}: value mismatch, first diffs: {diffs}")


# Every registry key currently carries a DuckDB oracle, so this rows-only
# smoke tier is EMPTY by design (the stronger parity test above covers all
# keys); pytest reports an empty parametrize as one documented skip. The
# tier stays so a future genuinely-non-SQL-expressible key (custom stateful
# streaming, iterative fixpoints) still gets a smoke run automatically.
@pytest.mark.parametrize("q", ROWS_ONLY, ids=lambda s: s.name)
def test_rows_only_runs(q, spark, sf_dir):
    df = q.build(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
