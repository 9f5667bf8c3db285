"""Behavioral-analytics specs over the events table.

Derivation: the reference's mailgun-event ETL (mitx_etl.py) lands raw
event streams; the analytics a lake consumer runs on them are funnels,
cohort retention, and path/transition analysis. All three are
shuffle-minimal: every stage is keyed by ``user_id``, so Catalyst reuses
one hash partitioning across the agg → join → agg chains.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from odl_etl_spark.functions.numeric import roundn
from odl_etl_spark.io.sources import load_table
from odl_etl_spark.queries.base import spec


@spec(
    "events_funnel",
    """
    WITH v AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS view_ts
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS click_ts
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.view_ts
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.click_ts
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """,
    doc=(
        "Sequential conversion funnel (view → click → purchase, strict "
        "event-time order): users who clicked AFTER their first view, "
        "then purchased AFTER that first qualifying click. Each stage "
        "is a user-keyed aggregate joined back to the events scan — the "
        "per-user min-timestamps are user-cardinality-sized (not "
        "event-sized), and every shuffle in the chain is on user_id, so "
        "AQE coalesces them into one partitioning at 100 TB."
    ),
)
def events_funnel(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        e.join(v, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") > F.col("view_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        e.join(c, "user_id")
        .where(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("click_ts"))
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("_n"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


@spec(
    "events_retention",
    """
    WITH u AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    f AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      FROM u GROUP BY user_id
    ), a AS (
      SELECT DISTINCT u.user_id, f.cohort, date_trunc('week', u.ts) AS wk
      FROM u JOIN f ON f.user_id = u.user_id
    )
    SELECT CAST(cohort AS DATE) AS cohort_week,
           CAST(date_diff('day', cohort, wk) // 7 AS INTEGER) AS week_offset,
           COUNT(*) AS n_users
    FROM a GROUP BY 1, 2
    """,
    doc=(
        "Weekly cohort retention: users bucketed by first-seen week, "
        "counted once per (cohort, activity-week). Both engines "
        "truncate weeks to Monday. The first-seen table is user-sized "
        "and joined on the same user_id key as the source aggregate; "
        "the DISTINCT collapses to (user, week) granularity before the "
        "final count, so the wide events table is scanned exactly once."
    ),
)
def events_retention(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    f = e.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    a = (
        e.join(f, "user_id")
        .select("user_id", "cohort", F.date_trunc("week", "ts").alias("wk"))
        .distinct()
    )
    return a.groupBy(
        F.to_date("cohort").alias("cohort_week"),
        (F.datediff(F.to_date("wk"), F.to_date("cohort")) / 7)
        .cast("int")
        .alias("week_offset"),
    ).agg(F.count("*").alias("n_users"))


@spec(
    "events_transitions",
    """
    WITH o AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS prev
      FROM events
    ), t AS (
      SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
      FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type) * 10000) / 10000
             AS p
    FROM t
    """,
    doc=(
        "Event-type transition matrix (first-order Markov): per-user "
        "event sequences lagged in event-time order, transition counts, "
        "and row-normalized probabilities. The lag window is PARTITIONED "
        "by user_id (parallel sorts, no global sort); the normalizing "
        "window runs over the |types|^2-row aggregate, not the input."
    ),
)
def events_transitions(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        e.select(
            F.col("event_type").alias("to_type"),
            F.lag("event_type").over(w).alias("from_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    norm = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n",
        roundn(F.col("n") / F.sum("n").over(norm), 4).alias("p"),
    )


SPECS = [
    events_funnel,
    events_retention,
    events_transitions,
]
