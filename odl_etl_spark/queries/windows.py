"""Window-function specs (SURVEY §2B).

One shuffle on the partition key, then a sort within partitions; no
custom code. Deterministic convention: every ORDER BY inside a window
ends with a unique tie-break key (SURVEY §5.2).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from odl_etl_spark.functions.numeric import roundn
from odl_etl_spark.io.sources import load_table
from odl_etl_spark.queries.base import spec


@spec(
    "win_rank",
    """
    SELECT c_custkey, c_mktsegment, c_nationkey,
           ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_nationkey, c_custkey) AS rn,
           RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS drnk
    FROM customer
    """,
    doc="row_number / rank / dense_rank with real ties on c_nationkey.",
)
def win_rank(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    seg = Window.partitionBy("c_mktsegment")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_nationkey",
        F.row_number().over(seg.orderBy("c_nationkey", "c_custkey")).alias("rn"),
        F.rank().over(seg.orderBy("c_nationkey")).alias("rnk"),
        F.dense_rank().over(seg.orderBy("c_nationkey")).alias("drnk"),
    )


@spec(
    "win_analytic",
    """
    SELECT event_id, user_id, value,
           LAG(value) OVER w AS prev_val,
           LEAD(value) OVER w AS next_val,
           FIRST_VALUE(event_id) OVER w AS first_event
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead/first_value over per-user event time.",
)
def win_analytic(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_val"),
        F.lead("value").over(w).alias("next_val"),
        F.first("event_id").over(w).alias("first_event"),
    )


@spec(
    "win_frame",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100) / 100
             AS running_sum,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100) / 100
             AS moving_avg3
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
    """,
    doc="Running sum + 3-row moving average (explicit ROWS frames).",
)
def win_frame(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = base.rowsBetween(-2, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        roundn(F.sum("value").over(running), 2).alias("running_sum"),
        roundn(F.avg("value").over(moving), 2).alias("moving_avg3"),
    )


@spec(
    "win_ntile",
    """
    SELECT c_custkey,
           NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS bal_decile
    FROM customer
    """,
    doc=(
        "Decile bucketing of account balance with exact NTILE semantics, "
        "computed WITHOUT an unpartitioned window: range-shuffle on the "
        "sort key, per-partition row_number, cumulative partition offsets "
        "(one row per partition), then NTILE arithmetic on the global row "
        "number — operators/ranking.py. The only single-partition stage "
        "is over the O(#partitions)-row offset table."
    ),
)
def win_ntile(spark, sf_dir):
    from odl_etl_spark.operators.ranking import ntile_exact

    c = load_table(spark, sf_dir, "customer")
    return ntile_exact(
        c, ["c_acctbal", "c_custkey"], 10, tile_col="bal_decile"
    ).select("c_custkey", "bal_decile")


@spec(
    "win_cume",
    """
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal, c_custkey) * 1000000) / 1000000
             AS pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal, c_custkey) * 1000000) / 1000000
             AS cume
    FROM customer
    """,
    doc="percent_rank / cume_dist distribution functions per segment.",
)
def win_cume(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        roundn(F.percent_rank().over(w), 6).alias("pct_rank"),
        roundn(F.cume_dist().over(w), 6).alias("cume"),
    )


@spec(
    "win_range_frame",
    """
    SELECT s_suppkey, s_acctbal,
           COUNT(*) OVER (ORDER BY s_acctbal
                          RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING) AS peers_500,
           ROUND(SUM(s_acctbal) OVER (ORDER BY s_acctbal
                          RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW) * 100) / 100
             AS trailing_sum
    FROM supplier
    """,
    doc=(
        "Value-RANGE window frames (peers within ±500 of each balance) — "
        "frames defined on the ORDER BY value, not row offsets."
    ),
)
def win_range_frame(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy("s_acctbal")
    return s.select(
        "s_suppkey",
        "s_acctbal",
        F.count("*").over(w.rangeBetween(-500, 500)).alias("peers_500"),
        roundn(
            F.sum("s_acctbal").over(w.rangeBetween(-500, Window.currentRow)), 2
        ).alias("trailing_sum"),
    )


@spec(
    "timeseries_gapfill",
    """
    WITH b AS (
      SELECT o_orderstatus AS status, CAST(o_orderdate AS DATE) AS d,
             COUNT(*) AS n, SUM(o_totalprice) AS total
      FROM orders GROUP BY 1, 2
    ), r AS (
      SELECT status, MIN(d) AS lo, MAX(d) AS hi FROM b GROUP BY status
    ), spine AS (
      SELECT status,
             CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS d
      FROM r
    ), j AS (
      SELECT s.status, s.d, b.n, b.total
      FROM spine s LEFT JOIN b ON b.status = s.status AND b.d = s.d
    )
    SELECT status, d, COALESCE(n, 0) AS n,
           ROUND(LAST_VALUE(total IGNORE NULLS)
                   OVER (PARTITION BY status ORDER BY d) * 100) / 100
             AS filled_total
    FROM j
    """,
    doc=(
        "Time-series gap-fill: per-series date spine (sequence + explode "
        "from the 3-row bounds aggregate — generation cost is O(series × "
        "days), independent of fact size), left join of the daily "
        "aggregate onto the spine, and forward-fill of missing days via "
        "last(..., ignorenulls) over an ORDER BY d window. The fill "
        "window is partitioned per series and its length is the calendar "
        "span, not the row count — bounded at any data scale. The daily "
        "pre-aggregate is the only pass over the fact table."
    ),
)
def timeseries_gapfill(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.to_date("o_orderdate").alias("d"),
    ).agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("total"))
    bounds = daily.groupBy("status").agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    spine = bounds.select(
        "status", F.explode(F.sequence("lo", "hi")).alias("d")
    )
    j = spine.join(daily, ["status", "d"], "left")
    w = Window.partitionBy("status").orderBy("d")
    return j.select(
        "status",
        "d",
        F.coalesce("n", F.lit(0)).alias("n"),
        roundn(F.last("total", ignorenulls=True).over(w), 2).alias(
            "filled_total"
        ),
    )


@spec(
    "win_first_last",
    """
    SELECT user_id, event_id,
           FIRST_VALUE(event_type) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS first_type,
           LAST_VALUE(event_type) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_type,
           NTH_VALUE(event_type, 2) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_type
    FROM events
    """,
    doc=(
        "first_value / last_value / nth_value over the full-partition "
        "frame (the navigation-function trio missing from win_analytic's "
        "lag/lead): each event row carries its user's first, last and "
        "second event type. All three share ONE window spec, so Catalyst "
        "plans a single user-keyed exchange + one sort; the explicit "
        "unbounded ROWS frame matters — the default RANGE..CURRENT frame "
        "would make last_value degenerate to the current row (and "
        "nth_value null until row 2) on both engines."
    ),
)
def win_first_last(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


SPECS = [
    win_rank,
    win_analytic,
    win_frame,
    win_ntile,
    win_cume,
    win_range_frame,
    timeseries_gapfill,
    win_first_last,
]
