"""As-of (point-in-time) join — Spark lacks a native operator.

Semantics: for each left row, attach the single most recent right row
with the same key whose timestamp is <= the left timestamp (backward
as-of; the standard enrichment join for event streams against slowly
updating state).

Implementation is the *union + running-carry* pattern, NOT a range join:

    1. tag left rows (_side=1) and right rows (_side=0), union them;
    2. one shuffle: window partitioned by key, ordered by
       (ts, _side, right-tiebreak);
    3. carry the latest right payload forward with
       ``last(..., ignorenulls=True)`` over rowsBetween(-inf, 0);
    4. keep the left rows.

Scale rationale: a naive ``l JOIN r ON key AND r.ts <= l.ts`` +
row_number explodes to O(|matches|) intermediate rows (at 100 TB a
hot key can produce billions of pairs before the filter); the union
pattern is O(|L|+|R|) with exactly one shuffle on the join key, and AQE
skew-split handles hot keys. Right rows sort before left rows at equal
ts (_side 0 < 1) so ties honor ts<=ts; among equal right timestamps the
tiebreak column decides deterministically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join; returns all left columns plus ``payload``
    columns from the latest right row at-or-before ``left_ts``.

    ``payload`` column names must not collide with left columns.
    ``tiebreak`` orders right rows sharing (key, ts); highest wins.
    """
    on = list(on)
    payload = list(payload)
    left_cols = left.columns
    collisions = set(payload) & set(left_cols)
    if collisions:
        raise ValueError(f"payload columns collide with left side: {sorted(collisions)}")

    l_tagged = left.select(
        *left_cols,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rtb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on],
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")).alias("_rtb"),
        *payload,
    ).select(*l_tagged.columns)  # align column order for unionByName-free union

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc(), F.col("_rtb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *left_cols,
        F.col("_side"),
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_carried_{c}")
            for c in payload
        ],
    )
    return carried.where(F.col("_side") == 1).select(
        *left_cols, *[F.col(f"_carried_{c}").alias(c) for c in payload]
    )
