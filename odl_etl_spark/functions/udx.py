"""User-defined execution surface: pandas UDAF and Python UDTF.

Completes the UDF matrix from SURVEY §2B (scalar pandas UDF lives in the
``udf_scalar_pandas`` query spec): a grouped-map UDAF via
``applyInPandas`` (Arrow-batched per group — for aggregations expression
combinators can't express) and a Python UDTF (one row in, N rows out,
usable from SQL via ``spark.udtf.register``).

These are the engine's escape hatches; the rule stands that built-ins
win when they can express the semantics (a UDAF that is just sum/avg
belongs in ``groupBy().agg``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf


def weighted_avg_udaf(
    df: DataFrame, group_cols: list[str], value_col: str, weight_col: str
) -> DataFrame:
    """Per-group weighted average via applyInPandas (grouped-map UDAF)."""
    out_schema = (
        ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in group_cols)
        + ", weighted_avg double"
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        w = pdf[weight_col].sum()
        wavg = float((pdf[value_col] * pdf[weight_col]).sum() / w) if w else float("nan")
        return pd.DataFrame([[*[pdf[c].iloc[0] for c in group_cols], wavg]],
                            columns=[*group_cols, "weighted_avg"])

    return df.groupBy(*group_cols).applyInPandas(agg, schema=out_schema)


@udtf(returnType="term: string, pos: int")
class TokenizeUDTF:
    """UDTF: one text row → one row per token with its position."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for pos, term in enumerate(t for t in text.lower().split() if t):
            yield term, pos


def register_udtfs(spark) -> None:
    """Expose the UDTF surface to SQL: ``SELECT * FROM tokenize('a b')``."""
    spark.udtf.register("tokenize", TokenizeUDTF)
