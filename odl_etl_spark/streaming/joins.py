"""Stream-stream joins with event-time range bounds.

A stream⋈stream join must bound how long each side's rows stay in state;
the watermark + time-range condition does that: a click can only match a
purchase in the trailing ``within`` window, so state for older rows is
evicted. Without the range condition the state store grows forever —
the same unbounded-state trap as un-watermarked dedup.

Works identically on batch frames (the range condition is just a theta
join there), which is how the tests oracle it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right rows whose timestamp falls in ``[left_ts - within,
    left_ts]`` for the same key. Columns from both sides are preserved;
    the right side's key/ts are suffixed ``_r``."""
    r = right
    for c in r.columns:
        r = r.withColumnRenamed(c, f"{c}_r")
    if left.isStreaming:
        left = left.withWatermark(left_ts, within)
    if r.isStreaming:
        r = r.withWatermark(f"{right_ts}_r", within)
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col(f"{right_ts}_r") >= F.col(left_ts) - F.expr(f"INTERVAL {within}"))
        & (F.col(f"{right_ts}_r") <= F.col(left_ts))
    )
    return left.join(r, cond, how)
