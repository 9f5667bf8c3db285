"""Aggregation specs (SURVEY §2B).

All stock Catalyst hash aggregation: partial (map-side) + final after the
key shuffle, whole-stage codegen'd. The scale lever is that partial agg
collapses data *before* the exchange — a groupBy on low-cardinality keys
moves KBs per partition regardless of input TBs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from odl_etl_spark.functions.numeric import (
    ORDERS_TOTALPRICE_BOUND,
    cents,
    roundn,
    sum_cents,
)
from odl_etl_spark.io.sources import load_table, money_acc
from odl_etl_spark.queries.base import spec


@spec(
    "agg_groupby",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_qty,
           SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) / 1e2
             AS sum_base_price,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                    AS BIGINT)) / 1e4 AS sum_disc_price,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                          * 1000000 + 0.5) AS BIGINT)) / 1e6 AS sum_charge,
           ROUND(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) * 1e2
                 / COUNT(*)) / 100 AS avg_qty,
           ROUND(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) * 1e0
                 / COUNT(*)) / 100 AS avg_price,
           ROUND(SUM(CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)) * 1e0
                 / COUNT(*)) / 10000 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc=(
        "TPC-H Q1 shape: the canonical partial+final hash aggregation. "
        "Money/ratio columns carry the scaled-BIGINT convention (round-12 "
        "exposure audit, VERDICT r11 #3): the 4/6-decimal product sums "
        "(disc_price, charge) live on a decimal grid that CONTAINS exact "
        ".5 rounding boundaries, so a double SUM's engine-order error "
        "decides the rounded digit with probability ~1/100 per group — "
        "per-row scaled quantization recovers exact grid integers (float "
        "error ~1e-7 of a grid step) and integer sums are order-free. "
        "The quantizer is floor(x*scale + 0.5) on BOTH engines (see "
        "functions/numeric.cents): pure-double codegen, ~2x faster than "
        "ROUND's BigDecimal path, identical IEEE ops cross-engine. "
        "Averages divide two exact integers, so both engines round the "
        "identical IEEE double even when C/n lands exactly on .5."
    ),
)
def agg_groupby(spark, sf_dir):
    from odl_etl_spark.functions.numeric import (
        LINEITEM_CHARGE_BOUND,
        scaled_sum_acc_type,
    )
    from odl_etl_spark.io.sources import cached_count

    # True charge bound, not a padded power of ten (ADVICE r12 #3),
    # documented at LINEITEM_CHARGE_BOUND. Past ~40.7M lineitem rows
    # (margin-2 widening ceiling — the last provably-exact int64 row)
    # the accumulators widen to DECIMAL(38,0) instead of refusing:
    # exact integer sums either way, identical result schema, but a
    # measured x5 slower (BigDecimal lane) — see scaled_sum_acc_type.
    # Every driver-checked scale picks bigint, the byte-identical plan.
    acc_type = scaled_sum_acc_type(
        cached_count(spark, sf_dir, "lineitem"),
        LINEITEM_CHARGE_BOUND,
        10**6,
        what="agg_groupby sum_charge",
    )

    def acc(c):
        return c.cast("decimal(38,0)") if acc_type != "bigint" else c
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    qty_i = cents(F.col("l_quantity"), 0)
    price_c = cents(F.col("l_extendedprice"), 2)
    disc_price_c = cents(disc_price, 4)
    charge_c = cents(disc_price * (1 + F.col("l_tax")), 6)
    disc_c = cents(F.col("l_discount"), 4)
    n = F.count("*")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(acc(qty_i)).cast("bigint").alias("sum_qty"),
        (F.sum(acc(price_c)) / F.lit(1e2)).alias("sum_base_price"),
        (F.sum(acc(disc_price_c)) / F.lit(1e4)).alias("sum_disc_price"),
        (F.sum(acc(charge_c)) / F.lit(1e6)).alias("sum_charge"),
        (F.round(F.sum(acc(qty_i)) * F.lit(1e2) / n) / 100).alias("avg_qty"),
        (F.round(F.sum(acc(price_c)) * F.lit(1e0) / n) / 100).alias("avg_price"),
        (F.round(F.sum(acc(disc_c)) * F.lit(1e0) / n) / 10000).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@spec(
    "agg_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact distinct aggregation (expand+two-phase under the hood).",
)
def agg_distinct(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@spec(
    "agg_approx_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(*) AS n_rows,
           TRUE AS within_10pct
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "HyperLogLog++ distinct estimate (rsd=0.05): at 100 TB the exact "
        "expand+shuffle is the bottleneck; HLL sketches merge in fixed "
        "memory. Bounds-style oracle: the raw estimate is engine-specific, "
        "so the comparable output is the exact count plus a boolean "
        "asserting |approx-exact| <= 10%·exact (measured error is ~2.7% "
        "at sf0.001-0.1; HLL is hash-deterministic, so this is stable)."
    ),
)
def agg_approx_distinct(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    approx = F.approx_count_distinct("l_partkey", 0.05)
    exact = F.countDistinct("l_partkey")
    return (
        l.groupBy("l_returnflag")
        .agg(
            approx.alias("_approx"),
            exact.alias("exact_parts"),
            F.count("*").alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "n_rows",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= 0.10 * F.col("exact_parts")
            ).alias("within_10pct"),
        )
    )


@spec(
    "agg_rollup",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 1e2 AS total
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    doc="Hierarchical totals: (status,priority) → (status) → ().",
)
def agg_rollup(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), sum_cents(
            F.col("o_totalprice"),
            acc=money_acc(
                spark, sf_dir, "orders", ORDERS_TOTALPRICE_BOUND, 10**2,
                what="agg_rollup total",
            ),
        ).alias("total")
    )


@spec(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 1e2 AS total
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="All 2^k grouping combinations.",
)
def agg_cube(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), sum_cents(
            F.col("o_totalprice"),
            acc=money_acc(
                spark, sf_dir, "orders", ORDERS_TOTALPRICE_BOUND, 10**2,
                what="agg_cube total",
            ),
        ).alias("total")
    )


@spec(
    "agg_gsets",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    doc="Explicit grouping sets via the SQL surface.",
)
def agg_gsets(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gsets_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM _gsets_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@spec(
    "agg_having",
    """
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_cust,
           ROUND(AVG(c_acctbal) * 100) / 100 AS avg_bal
    FROM customer
    GROUP BY c_mktsegment, c_nationkey
    HAVING COUNT(*) >= 10 AND AVG(c_acctbal) > 3000.0
    """,
    doc="Post-aggregation filter (HAVING).",
)
def agg_having(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            F.avg("c_acctbal").alias("_avg_bal_raw"),
        )
        .where((F.col("n_cust") >= 10) & (F.col("_avg_bal_raw") > 3000.0))
        .select(
            "c_mktsegment",
            "c_nationkey",
            "n_cust",
            roundn(F.col("_avg_bal_raw"), 2).alias("avg_bal"),
        )
    )


@spec(
    "agg_stats",
    """
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice) * 10000) / 10000 AS qty_price_corr,
           ROUND(COVAR_SAMP(l_quantity, l_discount) * 10000) / 10000 AS qty_disc_covar,
           ROUND(STDDEV_SAMP(l_extendedprice) * 100) / 100 AS price_stddev,
           ROUND(VAR_SAMP(l_quantity) * 100) / 100 AS qty_var
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: corr / covar_samp / stddev_samp / var_samp.",
)
def agg_stats(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        roundn(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        roundn(F.covar_samp("l_quantity", "l_discount"), 4).alias("qty_disc_covar"),
        roundn(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        roundn(F.var_samp("l_quantity"), 2).alias("qty_var"),
    )


@spec(
    "agg_collect",
    """
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           len(list(n_name)) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
    doc=(
        "Collect-to-list aggregation (array_agg/listagg shape), made "
        "deterministic by sorting before serialization — collect_list "
        "order is otherwise execution-dependent."
    ),
)
def agg_collect(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
        F.count("n_name").alias("n_nations"),
    )


@spec(
    "agg_pivot",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY user_id
    """,
    doc=(
        "Pivot (long→wide) of event counts per user. Pivot values are "
        "declared explicitly — at scale, never let pivot run its implicit "
        "distinct-collect over the full table to discover them."
    ),
)
def agg_pivot(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", kinds)
        .count()
        .na.fill(0, kinds)
        .select("user_id", *[F.col(k).alias(k) for k in kinds])
    )


@spec(
    "agg_approx_quantile",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5) * 100) / 100 AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.95) * 100) / 100 AS p95,
           COUNT(*) AS n,
           TRUE AS approx_within_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Percentiles per return flag, both paths: exact interpolated "
        "percentile (Spark `percentile` ≡ DuckDB quantile_cont, the "
        "hash-comparable columns) and the GK-sketch percentile_approx — "
        "the path that replaces a global sort at 100 TB — asserted within "
        "1% of exact (measured error ≤ 0.08% at sf0.001-0.1; the sketch "
        "is deterministic for a given dataset)."
    ),
)
def agg_approx_quantile(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    pcts = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)))
    apx = F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000)
    return (
        l.groupBy("l_returnflag")
        .agg(pcts.alias("_ex"), apx.alias("_ap"), F.count("*").alias("n"))
        .select(
            "l_returnflag",
            roundn(F.element_at("_ex", 1), 2).alias("p50"),
            roundn(F.element_at("_ex", 2), 2).alias("p95"),
            "n",
            (
                (
                    F.abs(F.element_at("_ap", 1) - F.element_at("_ex", 1))
                    <= 0.01 * F.element_at("_ex", 1)
                )
                & (
                    F.abs(F.element_at("_ap", 2) - F.element_at("_ex", 2))
                    <= 0.01 * F.element_at("_ex", 2)
                )
            ).alias("approx_within_1pct"),
        )
    )


EXACT_PCTL_MAX_GROUPS = 10_000


def guard_bounded_groups(df, key: str, bound: int = EXACT_PCTL_MAX_GROUPS) -> None:
    """Refuse exact per-group percentiles over unbounded keys.

    Exact percentile buffers every group's values in executor memory, so
    it is only safe when the group count is bounded; unbounded keys must
    route to the mergeable approx sketch (`agg_approx_quantile`). The
    cardinality probe is a column-pruned approx_count_distinct — one
    tiny extra job returning a single driver-side scalar (parameter
    data, same posture as centroid collects)."""
    n = df.select(F.approx_count_distinct(key).alias("n")).first()["n"]
    if n > bound:
        raise ValueError(
            f"exact percentile over '{key}' (~{n} groups > {bound}): "
            "per-group value buffering would be unbounded — use "
            "agg_approx_quantile (mergeable sketch) for this key"
        )


@spec(
    "agg_exact_median",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5) * 100) / 100 AS med_qty,
           ROUND(quantile_cont(l_extendedprice, 0.25) * 100) / 100 AS p25_price,
           ROUND(quantile_cont(l_extendedprice, 0.75) * 100) / 100 AS p75_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Exact median / quartiles per group: Spark's exact percentile "
        "(linear interpolation, same formula as DuckDB quantile_cont) — "
        "the exact counterpart of the agg_approx_quantile sketch. Exact "
        "percentile buffers each group's values, so at 100 TB it is for "
        "bounded-cardinality groups only; `guard_bounded_groups` "
        "enforces that at runtime and steers unbounded keys to the "
        "approx sketch (mergeable, fixed memory)."
    ),
)
def agg_exact_median(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    guard_bounded_groups(l, "l_returnflag")
    return l.groupBy("l_returnflag").agg(
        roundn(F.percentile("l_quantity", 0.5), 2).alias("med_qty"),
        roundn(F.percentile("l_extendedprice", 0.25), 2).alias("p25_price"),
        roundn(F.percentile("l_extendedprice", 0.75), 2).alias("p75_price"),
    )


@spec(
    "agg_sketch_partial",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_10pct
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Mergeable-sketch rollup — THE 100 TB distinct-count pattern: "
        "HLL sketches built at fine granularity (returnflag x "
        "linestatus; in production, per partition/day) then "
        "hll_union_agg-merged to the coarse level WITHOUT rescanning "
        "the fact table. Sketch merge is associative, so pre-aggregated "
        "daily sketches answer any coarser rollup in dimension-sized "
        "work. Bounds-style oracle (as agg_approx_distinct): the "
        "comparable output is the exact count plus a boolean asserting "
        "the merged estimate lands within 10% of it."
    ),
)
def agg_sketch_partial(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    part = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("_sk")
    )
    merged = part.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_approx")
    )
    exact = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return exact.join(merged, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("_approx") - F.col("exact_parts"))
            <= 0.10 * F.col("exact_parts")
        ).alias("within_10pct"),
    )


@spec(
    "agg_histogram",
    """
    SELECT CAST(LEAST(FLOOR(o_totalprice / 30000), 19) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 1e2 AS total
    FROM orders GROUP BY 1
    """,
    doc=(
        "Fixed-width histogram (width_bucket semantics: 20 bins of 30k "
        "with a clamped top bin): the bucket id is a pure expression, so "
        "this is one codegen'd partial+final hash aggregation over at "
        "most 20 groups — bytes-per-partition shuffle regardless of "
        "input size. The scale pattern for distribution profiling."
    ),
)
def agg_histogram(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 30000), F.lit(19)).cast(
        "bigint"
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        sum_cents(
            F.col("o_totalprice"),
            acc=money_acc(
                spark, sf_dir, "orders", ORDERS_TOTALPRICE_BOUND, 10**2,
                what="agg_histogram total",
            ),
        ).alias("total"),
    )


@spec(
    "agg_mode",
    """
    WITH c AS (
      SELECT l_returnflag, l_quantity, COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2
    ), r AS (
      SELECT l_returnflag, l_quantity, n,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, l_quantity ASC) AS rk
      FROM c
    )
    SELECT l_returnflag, l_quantity AS mode_qty, n
    FROM r WHERE rk = 1
    """,
    doc=(
        "Per-group modal value: count-compress first (hash agg over "
        "|group × distinct value| rows), then rank the tiny count table "
        "— the window sort runs over the compressed aggregate, never the "
        "input. Ties break to the smallest value for determinism."
    ),
)
def agg_mode(spark, sf_dir):
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity").asc()
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"), "n")
    )


@spec(
    "unpivot_long",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(AVG(l_quantity) * 100) / 100 AS avg_qty
    FROM lineitem GROUP BY 1, 2
    """,
    doc=(
        "Pivot→unpivot round-trip: the wide per-(returnflag × linestatus) "
        "matrix is melted back to long form with df.unpivot (Spark's "
        "melt; null cells from absent combinations dropped), and the "
        "oracle is the plain two-key GROUP BY the round-trip must "
        "reproduce. Both pivot and unpivot operate on the |groups|-row "
        "aggregate, so the reshape costs nothing at scale."
    ),
)
def unpivot_long(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.avg("l_quantity"))
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["F", "O"],
            variableColumnName="l_linestatus",
            valueColumnName="avg_qty_raw",
        )
        .where(F.col("avg_qty_raw").isNotNull())
        .select(
            "l_returnflag",
            "l_linestatus",
            roundn(F.col("avg_qty_raw"), 2).alias("avg_qty"),
        )
    )


@spec(
    "agg_decimal_exact",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
             AS sum_price,
           CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
             AS min_price,
           CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
             AS max_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Exact DECIMAL(18,2) money aggregation — the financial-ledger "
        "semantics double arithmetic can't give: SUM over fixed-point "
        "decimals is associative and commutative, so the result is "
        "bit-identical under any partitioning/combine order (emitted as "
        "VARCHAR so the cross-engine hash compares digits, not float "
        "representations). Same partial+final hash-agg plan as "
        "agg_groupby; Spark widens the accumulator to DECIMAL(28,2) so "
        "100 TB of cents can't overflow. The cast itself is codegen'd."
    ),
)
def agg_decimal_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(dec).cast("string").alias("sum_price"),
        F.min(dec).cast("string").alias("min_price"),
        F.max(dec).cast("string").alias("max_price"),
        F.count("*").alias("n"),
    )


@spec(
    "agg_corr",
    """
    SELECT event_type, n,
           ROUND((n * 1e0 * sxy - sx * 1e0 * sy)
                 / SQRT((n * 1e0 * sxx - sx * 1e0 * sx)
                        * (n * 1e0 * syy - sy * 1e0 * sy))
                 * 1000000) / 1000000 AS corr_value_hour
    FROM (
      SELECT event_type, COUNT(*) AS n,
             SUM(xc) AS sx, SUM(y) AS sy,
             SUM(xc * xc) AS sxx, SUM(y * y) AS syy, SUM(xc * y) AS sxy
      FROM (SELECT event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS xc,
                   CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS BIGINT)
                     AS y
            FROM events) raw
      GROUP BY event_type
    ) stats
    """,
    doc=(
        "Per-group Pearson correlation (value vs hour-of-day) from "
        "integer-exact sufficient statistics — the emb_covariance "
        "determinism pattern applied to the classic corr() aggregate: "
        "the five sums accumulate scaled BIGINTs (associative in any "
        "partial-agg order), and only the closed-form finalization runs "
        "in doubles, identically on both engines. One map-side-combined "
        "exchange of 5 counters per group regardless of input size — "
        "the same cost profile as built-in corr(), but cross-engine "
        "hash-stable, which F.corr's double accumulation is not."
    ),
)
def agg_corr(spark, sf_dir):
    from odl_etl_spark.functions.numeric import assert_scaled_sum_headroom

    e = load_table(spark, sf_dir, "events")
    # xc² terms dominate: |value| ≤ 1e3 (fixture contract) → (1e2·1e3)² =
    # 1e10 per row; the guard sizes the per-group sum to the table count.
    assert_scaled_sum_headroom(
        e.count(), (100.0 * 1000.0) ** 2, 1, what="agg_corr sum(xc*xc)"
    )
    raw = e.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("xc"),
        F.hour("ts").cast("bigint").alias("y"),
    )
    stats = raw.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("xc").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("xc") * F.col("xc")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("xc") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    one = F.lit(1.0)
    corr = (n * one * sxy - sx * one * sy) / F.sqrt(
        (n * one * sxx - sx * one * sx) * (n * one * syy - sy * one * sy)
    )
    return stats.select("event_type", "n", roundn(corr, 6).alias("corr_value_hour"))


SPECS = [
    agg_groupby,
    agg_stats,
    agg_collect,
    agg_pivot,
    agg_approx_quantile,
    agg_distinct,
    agg_approx_distinct,
    agg_rollup,
    agg_cube,
    agg_gsets,
    agg_having,
    agg_sketch_partial,
    agg_exact_median,
    agg_histogram,
    agg_mode,
    unpivot_long,
    agg_decimal_exact,
    agg_corr,
]
