"""Streaming specs — batch-equivalent forms (SURVEY §2B).

Each key runs the *batch* DataFrame equivalent of a Structured Streaming
query so DuckDB can oracle it; the true ``readStream`` versions of the
same logic live in ``odl_etl_spark/streaming/`` with unit tests
(micro-batch replay, watermarks, late-data drops). Window starts are
emitted as epoch microseconds (`unix_micros` ↔ `epoch_us`) — integer on
both engines, immune to timestamp serialization differences.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from odl_etl_spark.functions.numeric import roundn
from odl_etl_spark.io.sources import load_table
from odl_etl_spark.queries.base import spec


@spec(
    "stream_tumbling",
    """
    SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS window_us,
           event_type, COUNT(*) AS n,
           ROUND(SUM(value) * 100) / 100 AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="1-hour tumbling window count/sum per event_type (F.window).",
)
def stream_tumbling(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), roundn(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_micros("w.start").alias("window_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@spec(
    "stream_sliding",
    """
    SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 900000000 - k) * 900000000 AS window_us,
           event_type, COUNT(*) AS n
    FROM events, (VALUES (0), (1), (2), (3)) offsets(k)
    GROUP BY 1, 2
    """,
    doc=(
        "1-hour window sliding every 15 min: each event lands in 4 "
        "windows (F.window duration+slide explodes rows identically)."
    ),
)
def stream_sliding(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros("w.start").alias("window_us"), "event_type", "n")
    )


@spec(
    "stream_session",
    """
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), marked AS (
      SELECT user_id, ts, value,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      FROM ordered
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id, epoch_us(MIN(ts)) AS session_start_us,
           COUNT(*) AS n_events,
           ROUND(SUM(value) * 100) / 100 AS sum_value
    FROM sessions GROUP BY user_id, sid
    """,
    doc=(
        "Session windows per user, 30-min gap (F.session_window). Oracle is "
        "the classic gaps-and-islands SQL; a new session starts when the "
        "gap is >= 30 min, matching Spark's half-open [ts, ts+gap) merge."
    ),
)
def stream_session(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), roundn(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


@spec(
    "stream_dedup",
    """
    SELECT event_id, user_id, event_type,
           epoch_us(date_trunc('minute', CAST(ts AS TIMESTAMP))) AS minute_us
    FROM (
      SELECT event_id, user_id, event_type, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type, date_trunc('minute', CAST(ts AS TIMESTAMP))
               ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc=(
        "Keyed dedup: earliest event per (user, type, minute) — the batch "
        "form of dropDuplicates-within-watermark; deterministic keep rule "
        "(min ts, then min event_id)."
    ),
)
def stream_dedup(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").withColumn(
        "minute", F.date_trunc("minute", "ts")
    )
    w = Window.partitionBy("user_id", "event_type", "minute").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros("minute").alias("minute_us"),
        )
    )


@spec(
    "stream_interval_join",
    """
    SELECT p.user_id, COUNT(*) AS n_pairs,
           ROUND(SUM(p.value) * 100) / 100 AS purchase_value,
           epoch_us(MAX(CAST(c.ts AS TIMESTAMP))) AS last_click_us
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND CAST(c.ts AS TIMESTAMP)
         >= CAST(p.ts AS TIMESTAMP) - INTERVAL 30 MINUTE
     AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
    GROUP BY p.user_id
    """,
    doc=(
        "Stream-stream interval join, batch-equivalent form: purchases "
        "joined to same-user clicks in the trailing 30 minutes "
        "(streaming/joins.py:interval_join — identical logic runs on "
        "readStream with watermarks bounding both sides' state; the "
        "replay test asserts stream == batch). The time-range condition "
        "is what makes stream state evictable AND what lets AQE plan a "
        "plain keyed join here."
    ),
)
def stream_interval_join(spark, sf_dir):
    from odl_etl_spark.streaming.joins import interval_join

    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase")
    c = e.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = interval_join(p, c, key="user_id", within="30 minutes")
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        roundn(F.sum("value"), 2).alias("purchase_value"),
        F.unix_micros(F.max("ts_r")).alias("last_click_us"),
    )


@spec(
    "stream_cdc_apply",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           ROUND(value * 100) / 100 AS last_value,
           epoch_us(CAST(ts AS TIMESTAMP)) AS updated_us
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND event_type <> 'error'
    """,
    doc=(
        "Changelog apply / CDC compaction: materialize the current "
        "per-key state from an event stream — latest write wins "
        "(deterministic order: max ts, then max event_id), and a "
        "tombstone ('error') as the latest record deletes the key. "
        "This is the batch form of the foreachBatch MERGE pattern "
        "(stream upserts into a keyed table); one keyed window "
        "shuffle, and Spark's WindowGroupLimit pushes the rn=1 "
        "predicate into partial per-partition top-1 passes, so only "
        "one candidate row per key per task reaches the exchange. "
        "The true readStream loop lives in streaming/cdc.py "
        "(bucket-partitioned state via upsert_partitioned, replay-"
        "idempotent, tombstone-retaining); the replay test pins "
        "stream == batch."
    ),
)
def stream_cdc_apply(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            roundn(F.col("value"), 2).alias("last_value"),
            F.unix_micros("ts").alias("updated_us"),
        )
    )


@spec(
    "stream_running_totals",
    """
    WITH b AS (
      SELECT user_id, value,
             NTILE(4) OVER (ORDER BY ts, event_id) AS batch
      FROM events
    ), per AS (
      SELECT batch, user_id, COUNT(*) AS n,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS vc
      FROM b GROUP BY batch, user_id
    )
    SELECT CAST(batch AS BIGINT) AS batch, user_id,
           CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY batch)
                AS BIGINT) AS n_events,
           CAST(SUM(vc) OVER (PARTITION BY user_id ORDER BY batch)
                AS DOUBLE) / 100 AS total_value
    FROM per
    """,
    doc=(
        "Batch-equivalent of the custom stateful operator "
        "streaming/stateful.running_user_totals (applyInPandasWithState "
        "per-user running count/sum): events replayed as 4 deterministic "
        "arrival slices (exact NTILE over (ts, event_id) via "
        "operators/ranking.ntile_exact — range-shuffle + partition "
        "offsets, no single-task global window), and the result is the "
        "operator's full UPDATE-MODE EMISSION HISTORY — one row per "
        "(batch, user present in it) carrying the post-batch cumulative "
        "state — not just the final totals. The true readStream version "
        "is pinned row-identical to this key in tests/test_streaming.py "
        "(memory-sink updates == key rows on the same slicing), which "
        "closes the loop: the driver's DuckDB hash check oracles the "
        "batch form, and the tie test carries that guarantee onto the "
        "stateful streaming path. (transformWithStateInPandas runs the "
        "same processor on Spark 4, but its state-server protocol needs "
        "protobuf, absent in this harness — running_user_totals_tws "
        "stays unit-covered with a documented skip.) At 100 TB: "
        "per-(batch,user) partial aggs map-side combine; the cumulative "
        "window partitions by user — state-store semantics without "
        "state-store scans in the replay form. Input contract (ADVICE "
        "r12 #1): null value rows are skipped by both sides (F.sum / "
        "the stateful path's finite mask) with the row still counted; "
        "non-finite NON-null values (+/-inf) are OUT OF CONTRACT — the "
        "stateful operator masks them to protect its per-key state "
        "while this batch form would push a saturated ROUND(inf) term "
        "into the sum, so no stream==batch parity is defined for them."
    ),
)
def stream_running_totals(spark, sf_dir):
    from odl_etl_spark.operators.ranking import ntile_exact

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "value", "ts", "event_id"
    )
    batched = ntile_exact(e, ["ts", "event_id"], 4, tile_col="batch")
    # House money convention (emb_covariance r3 precedent): accumulate
    # scaled-BIGINT cents so every sum is integer-exact and order-free —
    # no unordered double SUM anywhere in the result path. Types are
    # pinned BIGINT/DOUBLE on BOTH engines (DuckDB NTILE emits BIGINT and
    # windowed SUM(BIGINT) emits HUGEINT; the oracle casts them down).
    per = batched.groupBy("batch", "user_id").agg(
        F.count("*").alias("_n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("_vc"),
    )
    w = Window.partitionBy("user_id").orderBy("batch")
    return per.select(
        F.col("batch").cast("bigint").alias("batch"),
        "user_id",
        F.sum("_n").over(w).cast("bigint").alias("n_events"),
        (F.sum("_vc").over(w).cast("double") / 100).alias("total_value"),
    )


SPECS = [
    stream_tumbling,
    stream_sliding,
    stream_session,
    stream_dedup,
    stream_interval_join,
    stream_cdc_apply,
    stream_running_totals,
]
