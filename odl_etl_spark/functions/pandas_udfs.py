"""Typed pandas UDF definitions (the modern type-hinted form).

Deliberately NO ``from __future__ import annotations`` here: Spark infers
a pandas UDF's eval type from *resolved* type hints (``pd.Series ->
pd.Series``); the future import stringifies annotations, and the hint
resolver then needs the names importable from the defining module's
globals at decoration time. Keeping this module future-import-free lets
every other module keep it while UDFs live here.
"""

import hashlib

import pandas as pd
from pyspark.sql.functions import pandas_udf


def salted_sha256_udf(salt: str):
    """Arrow-vectorized salted SHA-256 over a string column.

    Same bytes as ``functions/hashing.py`` (the reference's
    email_mapping.py:49-51 Series.apply hash); exists to exercise the
    Python-UDF execution path with the type-hinted ``pandas_udf`` API
    (the ``PandasUDFType.SCALAR`` enum form is deprecated).
    """
    salt_b = salt.encode()

    @pandas_udf("string")
    def hash_series(s: pd.Series) -> pd.Series:
        return s.map(lambda v: hashlib.sha256(salt_b + v.encode()).hexdigest())

    return hash_series
