"""Cross-engine-stable numeric helpers.

``ROUND(double, 2)`` is NOT portable: Spark rounds the shortest decimal
representation (``BigDecimal.valueOf``) while DuckDB rounds the binary
value, so values near a .xx5 boundary diverge (e.g. 8285.425 → 8285.43 vs
8285.42). The portable form is scale-to-integer rounding —
``round(x * 10^n) / 10^n`` — where both engines round the *same* IEEE
double half-away-from-zero. Use ``roundn`` in Spark builders and
``sql_roundn`` in oracle SQL; never bare ROUND(x, n) on doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def roundn(col: Column, n: int = 2) -> Column:
    p = float(10**n)
    return F.round(col * p) / p


def round2(col: Column) -> Column:
    return roundn(col, 2)


def sql_roundn(expr: str, n: int = 2) -> str:
    p = 10**n
    return f"ROUND(({expr}) * {p}) / {p}"
