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


@spec(
    "events_sessionize",
    """
    WITH o AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
             LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
      FROM events
    ), m AS (
      SELECT user_id, event_id, t_us,
             CASE WHEN prev_us IS NULL
                       OR t_us - prev_us > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM o
    ), s AS (
      SELECT user_id, t_us,
             SUM(is_new) OVER (PARTITION BY user_id
                               ORDER BY t_us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS session_id
      FROM m
    ), g AS (
      SELECT user_id, session_id, COUNT(*) AS n_events,
             MAX(t_us) - MIN(t_us) AS dur_us
      FROM s GROUP BY user_id, session_id
    )
    SELECT user_id, COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           MAX(n_events) AS max_session_events,
           CAST(SUM(dur_us) AS BIGINT) AS total_dur_us
    FROM g GROUP BY user_id
    """,
    doc=(
        "Gaps-and-islands sessionization (30-min inactivity gap): lag to "
        "mark session starts, running sum to number sessions, two keyed "
        "aggregations for per-session then per-user stats. Every window "
        "and groupBy is partitioned by user_id, so one hash partitioning "
        "is reused across the whole chain and no global sort exists — "
        "the per-user sort is bounded by a user's event count at any "
        "scale. Timestamps compare in integer microseconds (epoch_us / "
        "unix_micros) so the gap predicate is exact on both engines."
    ),
)
def events_sessionize(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    t_us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "event_id",
        t_us.alias("t_us"),
        F.when(
            F.lag(t_us).over(w).isNull()
            | ((t_us - F.lag(t_us).over(w)) > 1800 * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = (
        marked.select(
            "user_id", "t_us", F.sum("is_new").over(ws).alias("session_id")
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("t_us") - F.min("t_us")).alias("dur_us"),
        )
    )
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
        F.sum("dur_us").alias("total_dur_us"),
    )


@spec(
    "events_attribution",
    """
    WITH o AS (
      SELECT user_id, event_type, value,
             LAST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
      FROM events
    )
    SELECT COALESCE(channel, 'none') AS channel,
           COUNT(*) AS n_purchases,
           ROUND(SUM(value) * 100) / 100 AS revenue
    FROM o WHERE event_type = 'purchase'
    GROUP BY COALESCE(channel, 'none')
    """,
    doc=(
        "Last-touch attribution: each purchase's value is credited to the "
        "user's most recent prior non-purchase event type via "
        "last(..., ignorenulls) over a PRECEDING-only frame — the "
        "classic marketing-attribution shape without a self-join. The "
        "window is user-partitioned (parallel, bounded sorts); the final "
        "aggregate is over |event types| rows."
    ),
)
def events_attribution(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        e.select("event_type", "value", channel.alias("channel"))
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("none")).alias("channel"))
        .agg(
            F.count("*").alias("n_purchases"),
            roundn(F.sum("value"), 2).alias("revenue"),
        )
    )


# Shared with scd2_point_in_time's oracle (embedded as a CTE there);
# the text is the scd2_build contract and must stay byte-stable.
_SCD2_SQL = """
    WITH o AS (
      SELECT user_id, event_type, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS prev
      FROM events
    ), chg AS (
      SELECT user_id, event_type AS state, t_us AS eff_from_us, event_id
      FROM o WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, state, eff_from_us,
           COALESCE(LEAD(eff_from_us) OVER (PARTITION BY user_id
                                            ORDER BY eff_from_us, event_id),
                    253402300799000000) AS eff_to_us,
           CASE WHEN LEAD(eff_from_us) OVER (PARTITION BY user_id
                                             ORDER BY eff_from_us, event_id)
                     IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM chg
    """


def _scd2_changes(spark, sf_dir):
    """Per-user state-change rows (user_id, state, eff_from_us, event_id)
    — the change-compressed relation both scd2_build and the
    point-in-time lookup are built from."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.unix_micros("ts").alias("eff_from_us"),
            "event_id",
            F.lag("event_type").over(w).alias("prev"),
        )
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("state")))
        .drop("prev")
    )


@spec(
    "scd2_build",
    _SCD2_SQL,
    doc=(
        "Slowly-changing-dimension type-2 build (the CDC/warehouse shape "
        "the reference's daily snapshot sync approximates): per-user "
        "state-change detection via lag, then validity intervals "
        "[eff_from, eff_to) via lead over the change rows only. Both "
        "windows are user-partitioned — parallel bounded sorts, no "
        "global ordering — and the second window runs over the "
        "change-compressed (much smaller) relation. Timestamps compare "
        "as integer epoch-microseconds on both engines; the open row's "
        "eff_to is the 9999-12-31 sentinel rather than NULL so the "
        "column stays non-null BIGINT through any pandas/Arrow transport "
        "(nullable int64 silently becomes float64 and poisons dtype-"
        "sensitive hash comparison)."
    ),
)
def scd2_build(spark, sf_dir):
    chg = _scd2_changes(spark, sf_dir)
    wv = Window.partitionBy("user_id").orderBy("eff_from_us", "event_id")
    eff_to = F.lead("eff_from_us").over(wv)
    return chg.select(
        "user_id",
        "state",
        "eff_from_us",
        F.coalesce(eff_to, F.lit(253402300799000000)).alias("eff_to_us"),
        F.when(eff_to.isNull(), 1).otherwise(0).alias("is_current"),
    )


@spec(
    "timeseries_resample",
    """
    WITH b AS (
      SELECT event_type, value, event_id, CAST(ts AS TIMESTAMP) AS t,
             epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000 AS bkt
      FROM events
    ), o AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, bkt
                                ORDER BY t, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, bkt
                                ORDER BY t DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT event_type, bkt * 21600000000 AS bucket_us,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END) * 100) / 100 AS open,
           ROUND(MAX(value) * 100) / 100 AS high,
           ROUND(MIN(value) * 100) / 100 AS low,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END) * 100) / 100 AS close,
           COUNT(*) AS n_events
    FROM o GROUP BY event_type, bkt
    """,
    doc=(
        "Time-series downsampling to 6-hour OHLC bars per event type — "
        "the metrics-rollup shape for high-frequency event streams. "
        "First/last are picked by row_number over (ts, event_id) — a "
        "total order, so open/close are deterministic even with "
        "duplicate timestamps. Windows and the final agg share the "
        "(event_type, bucket) partitioning, so one shuffle feeds both; "
        "per-partition sort size is bounded by a bucket's row count at "
        "any scale. Bucket ids are integer epoch-microsecond floors — "
        "identical arithmetic on both engines."
    ),
)
def timeseries_resample(spark, sf_dir):
    bucket_us = 21_600_000_000
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        "event_id",
        "ts",
        F.expr(f"unix_micros(ts) div {bucket_us}").alias("bkt"),
    )
    wa = Window.partitionBy("event_type", "bkt").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bkt").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    o = e.select(
        "event_type",
        "bkt",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return o.groupBy("event_type", "bkt").agg(
        roundn(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 2).alias("open"),
        roundn(F.max("value"), 2).alias("high"),
        roundn(F.min("value"), 2).alias("low"),
        roundn(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 2).alias("close"),
        F.count("*").alias("n_events"),
    ).select(
        "event_type",
        (F.col("bkt") * bucket_us).alias("bucket_us"),
        "open",
        "high",
        "low",
        "close",
        "n_events",
    )


@spec(
    "events_anomaly",
    """
    WITH h AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT event_type, hr, n,
             SUM(n) OVER (PARTITION BY event_type) AS total,
             COUNT(*) OVER (PARTITION BY event_type) AS n_hours
      FROM h
    )
    SELECT event_type, hr * 3600000000 AS hour_us, n,
           ROUND((CAST(n * n_hours AS DOUBLE) / total) * 10000) / 10000 AS lift
    FROM w WHERE n * n_hours > 2 * total
    """,
    doc=(
        "Traffic-anomaly detection: hourly event counts per type, "
        "flagging hours whose volume exceeds 2× that type's mean hourly "
        "rate. The anomaly predicate is pure integer arithmetic "
        "(n · n_hours > 2 · total) so the selected row set is "
        "bit-identical across engines — no float-boundary hazard — and "
        "the reported lift is a single IEEE divide, rounded identically. "
        "The stats window runs over the hour-grain aggregate (|types| × "
        "|hours| rows), never the raw events; one shuffle on "
        "(event_type, hour), one broadcast-sized window."
    ),
)
def events_anomaly(spark, sf_dir):
    hour_us = 3_600_000_000
    h = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(f"unix_micros(ts) div {hour_us}").alias("hr"),
        )
        .agg(F.count("*").alias("n"))
    )
    ws = Window.partitionBy("event_type")
    w = h.select(
        "event_type",
        "hr",
        "n",
        F.sum("n").over(ws).alias("total"),
        F.count("*").over(ws).alias("n_hours"),
    )
    return w.where(F.col("n") * F.col("n_hours") > 2 * F.col("total")).select(
        "event_type",
        (F.col("hr") * hour_us).alias("hour_us"),
        "n",
        roundn((F.col("n") * F.col("n_hours")).cast("double") / F.col("total"), 4).alias(
            "lift"
        ),
    )


@spec(
    "events_path_topk",
    """
    WITH o AS (
      SELECT user_id, event_type,
             LAG(event_type, 2) OVER w AS e2,
             LAG(event_type, 1) OVER w AS e1
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
    )
    SELECT e2 || '>' || e1 || '>' || event_type AS path, COUNT(*) AS n
    FROM o WHERE e2 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 10
    """,
    doc=(
        "Top event-type trigram paths (sequence mining / journey "
        "analysis): each user's event stream in (ts, event_id) order "
        "yields one 3-gram per position via two lag()s over a "
        "user-partitioned window — no self-join, state is two rows per "
        "partition. The path-count agg has event-type^3 groups "
        "(map-side-combined to near-nothing) and the top-10 cut is "
        "TakeOrderedAndProject. One user-keyed shuffle total; at "
        "100 TB that partitioning is shared with every other per-user "
        "stage in the pipeline."
    ),
)
def events_path_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "event_type",
        F.lag("event_type", 2).over(w).alias("e2"),
        F.lag("event_type", 1).over(w).alias("e1"),
    )
    return (
        o.where(F.col("e2").isNotNull())
        .select(
            F.concat_ws(">", "e2", "e1", "event_type").alias("path"),
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
    )


_EWMA_LAGS = 8  # finite-impulse horizon (weights 2^-1 … 2^-8)


def _ewma_oracle() -> str:
    lags = ", ".join(
        f"LAG(v, {i}) OVER w AS v{i}" for i in range(1, _EWMA_LAGS)
    )
    num = " + ".join(
        f"COALESCE(v{i} * {2.0 ** -(i + 1)!r}, 0)" for i in range(_EWMA_LAGS)
    )
    den = " + ".join(
        f"(CASE WHEN v{i} IS NULL THEN 0 ELSE {2.0 ** -(i + 1)!r} END)"
        for i in range(_EWMA_LAGS)
    )
    return f"""
    WITH h AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ), l AS (
      SELECT event_type, hr, v AS v0, {lags}
      FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    )
    SELECT event_type, strftime(hr, '%Y-%m-%d %H:00') AS hour,
           ROUND(v0 * 100) / 100 AS v,
           ROUND(({num}) / ({den}) * 10000) / 10000 AS ewma
    FROM l
    """


@spec(
    "timeseries_ewma",
    _ewma_oracle(),
    doc=(
        "Exponentially weighted moving average over the hourly series "
        "per event type, as a finite-impulse filter: weights 2^-(i+1) "
        "over the last 8 points, renormalized at the series head — "
        "dyadic weights are exact in binary floats, so both engines "
        "compute bit-identical sums. The recursion is unrolled into 7 "
        "lag()s over one type-partitioned window on the HOURLY "
        "aggregate (hour-cardinality rows, not raw events): smoothing "
        "runs over data that is already 3-6 orders of magnitude smaller "
        "than the input, and the window partitioning reuses the "
        "aggregate's shuffle."
    ),
)
def timeseries_ewma(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    h = (
        e.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hr")
        ).agg(F.sum("value").alias("v0"))
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    lags = [F.col("v0")] + [
        F.lag("v0", i).over(w).alias(f"v{i}") for i in range(1, _EWMA_LAGS)
    ]
    l = h.select("event_type", "hr", *lags)
    num = sum(
        (F.coalesce(F.col(f"v{i}") * F.lit(2.0 ** -(i + 1)), F.lit(0.0))
         for i in range(1, _EWMA_LAGS)),
        F.col("v0") * F.lit(2.0 ** -1),
    )
    den = sum(
        (F.when(F.col(f"v{i}").isNull(), 0.0).otherwise(2.0 ** -(i + 1))
         for i in range(1, _EWMA_LAGS)),
        F.lit(2.0 ** -1),
    )
    return l.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
        roundn(F.col("v0"), 2).alias("v"),
        roundn(num / den, 4).alias("ewma"),
    )


@spec(
    "scd2_point_in_time",
    f"""
    WITH scd AS ({_SCD2_SQL}),
    p AS (
      SELECT event_id, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) - 3600000000 AS at_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, s.state, s.eff_from_us
    FROM p JOIN scd s
      ON p.user_id = s.user_id
     AND p.at_us >= s.eff_from_us
     AND p.at_us < s.eff_to_us
    """,
    doc=(
        "Point-in-time (temporal) lookup against the SCD2 dimension: "
        "each purchase is enriched with the state its user was in ONE "
        "HOUR BEFORE the purchase — the warehouse time-travel join "
        "(same shape enriches any fact against any SCD2 table). "
        "Because SCD2 intervals partition the timeline per key, "
        "containment equals backward as-of on eff_from, so the plan "
        "rides operators/asof.py's union+carry (ONE keyed shuffle, "
        "O(|L|+|R|) rows) instead of the oracle's interval theta join, "
        "which explodes to O(matches) pairs before filtering at scale. "
        "Probes before a user's first state change drop (inner PIT). "
        "Tiebreak among changes sharing eff_from_us is event_id "
        "(highest wins), mirroring the oracle's LEAD ordering by "
        "(eff_from_us, event_id) under which the tied-earlier change "
        "gets an empty [t,t) interval and drops — so both engines "
        "deterministically pick the LAST change at a tied timestamp "
        "(ADVICE r5)."
    ),
)
def scd2_point_in_time(spark, sf_dir):
    from odl_etl_spark.operators.asof import asof_join

    dim = _scd2_changes(spark, sf_dir).select(
        "user_id", "state", "eff_from_us", "event_id"
    )
    p = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            (F.unix_micros("ts") - F.lit(3600000000).cast("bigint")).alias("at_us"),
        )
    )
    j = asof_join(
        p,
        dim,
        on=["user_id"],
        left_ts="at_us",
        right_ts="eff_from_us",
        payload=["state", "eff_from_us"],
        tiebreak="event_id",
    )
    return j.where(F.col("state").isNotNull()).select(
        "event_id", "user_id", "state", "eff_from_us"
    )


SPECS = [
    events_funnel,
    events_retention,
    events_transitions,
    events_sessionize,
    events_attribution,
    scd2_build,
    timeseries_resample,
    events_anomaly,
    events_path_topk,
    timeseries_ewma,
    scd2_point_in_time,
]
