"""Join specs (SURVEY §2B).

The reference has zero joins (verified, SURVEY §2A) — these are the lake
analytics its extracted dims/facts exist to serve. All equi-joins are
stock Catalyst (broadcast-hash vs sort-merge chosen by size + AQE);
our work is strategy *choice* (explicit broadcast for dims), not
implementation. The as-of join composes the union+carry operator from
``odl_etl_spark.operators.asof``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from odl_etl_spark.functions.numeric import (
    LINEITEM_CHARGE_BOUND,
    cents,
    roundn,
    scaled_sum_acc_type,
)
from odl_etl_spark.io.sources import cached_count, load_table


def _rev_sum(spark, sf_dir, what):
    """Scaled 4-decimal lineitem revenue term for a money SUM: bigint
    cents to the last provably-exact row, DECIMAL(38,0)-widened past it
    (functions/numeric.scaled_sum_acc_type; driver scales always pick
    bigint — the byte-identical plan)."""
    term = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    acc = scaled_sum_acc_type(
        cached_count(spark, sf_dir, "lineitem"),
        LINEITEM_CHARGE_BOUND,
        10**4,
        what=what,
    )
    return term.cast("decimal(38,0)") if acc != "bigint" else term
from odl_etl_spark.operators.asof import asof_join
from odl_etl_spark.queries.base import spec


@spec(
    "join_inner_equi",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
    doc="Equi inner join orders⋈customer (shuffled or broadcast by AQE).",
)
def join_inner_equi(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@spec(
    "join_broadcast",
    """
    SELECT p.p_brand,
           COUNT(*) AS n_items,
           ROUND(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000
                                + 0.5) AS BIGINT)) / 1e2) / 100 AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    doc=(
        "Fact⋈small-dim with an explicit broadcast hint: at 100 TB the "
        "part dim stays broadcastable while lineitem never shuffles for "
        "the join; the groupBy is the only exchange (partial+final agg). "
        "Revenue rides the scaled-BIGINT cents convention (round-12 "
        "exposure audit): the 4-decimal product grid contains exact .5 "
        "cent boundaries, so an unordered double SUM is engine-order-"
        "dependent exactly there; the integer sum is order-free and the "
        "final display round divides two exact integers identically on "
        "both engines."
    ),
)
def join_broadcast(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            (
                F.round(
                    F.sum(_rev_sum(spark, sf_dir, "join_broadcast revenue"))
                    / F.lit(1e2)
                )
                / 100
            ).alias("revenue"),
        )
    )


@spec(
    "join_left",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 40000.0
    """,
    doc="Left outer join with nulls preserved for unmatched customers.",
)
def join_left(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 40000.0), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@spec(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    doc="Existence join (left_semi): customers with at least one urgent order.",
)
def join_semi(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@spec(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    doc="Absence join (left_anti): customers with no pending orders.",
)
def join_anti(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@spec(
    "join_theta_range",
    """
    SELECT p.p_partkey, s.s_suppkey, p.p_retailprice, s.s_acctbal
    FROM part p JOIN supplier s
      ON s.s_acctbal >= p.p_retailprice AND s.s_acctbal < p.p_retailprice + 50.0
    """,
    doc=(
        "Non-equi band join (supplier balance within [price, price+50)). "
        "Catalyst executes as BroadcastNestedLoopJoin with the small side "
        "broadcast — the right physical plan when one side fits in memory; "
        "for two large sides the scale path is banding both sides to an "
        "equi-join on floor(value/band) (see operators docs)."
    ),
)
def join_theta_range(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    return p.join(
        F.broadcast(s),
        (s.s_acctbal >= p.p_retailprice) & (s.s_acctbal < p.p_retailprice + 50.0),
    ).select("p_partkey", "s_suppkey", "p_retailprice", "s_acctbal")


@spec(
    "join_multiway",
    """
    SELECT n.n_name,
           COUNT(*) AS n_lineitems,
           ROUND(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000
                                + 0.5) AS BIGINT)) / 1e2) / 100 AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc=(
        "TPC-H Q5-shaped 5-table chain. Dims (region/nation/customer) "
        "broadcast; the only shuffles are orders⋈lineitem and the final "
        "agg — the plan shape that survives 100×."
    ),
)
def join_multiway(spark, sf_dir):
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            (
                F.round(
                    F.sum(_rev_sum(spark, sf_dir, "join_multiway revenue"))
                    / F.lit(1e2)
                )
                / 100
            ).alias("revenue"),
        )
    )


@spec(
    "join_asof",
    """
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS pts
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS cts, value
               FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, epoch_us(p.pts) AS purchase_us,
           epoch_us((SELECT MAX(c.cts) FROM c
                     WHERE c.user_id = p.user_id AND c.cts <= p.pts)) AS last_click_us
    FROM p
    """,
    doc=(
        "Backward as-of join: each purchase event picks up the most recent "
        "click by the same user. Union+running-carry implementation "
        "(operators/asof.py) — O(L+R), one shuffle, no range-join blowup."
    ),
)
def join_asof(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        payload=["click_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        F.unix_micros("click_ts").alias("last_click_us"),
    )


@spec(
    "join_full",
    """
    SELECT s.s_suppkey, s.s_name, n.n_nationkey, n.n_name
    FROM supplier s FULL OUTER JOIN nation n
      ON s.s_nationkey = n.n_nationkey AND s.s_acctbal > 5000.0
    """,
    doc="Full outer join: unmatched rows from both sides survive with nulls.",
)
def join_full(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return s.join(
        n, (s.s_nationkey == n.n_nationkey) & (s.s_acctbal > 5000.0), "full"
    ).select("s_suppkey", "s_name", "n_nationkey", "n_name")


@spec(
    "subq_in",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
    doc="IN-subquery through the SQL surface (planned as a semi join).",
)
def subq_in(spark, sf_dir):
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_sq_customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_sq_nation")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM _sq_customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM _sq_nation WHERE n_regionkey = 2)
        """
    )


@spec(
    "subq_scalar",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    """,
    doc=(
        "Correlated scalar subquery (orders above 2x their customer's "
        "average) — Catalyst decorrelates to an aggregate + join; no "
        "per-row re-execution."
    ),
)
def subq_scalar(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM _sq_orders o
        WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM _sq_orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
        """
    )


@spec(
    "join_bucketed",
    """
    SELECT o.o_orderstatus,
           COUNT(*) AS n_items,
           ROUND(SUM(l.l_extendedprice) * 100) / 100 AS sum_price
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
    doc=(
        "Bucketed co-located fact⋈fact join (io/bucketing.py): both "
        "sides are written bucketBy(8, orderkey) — the join shuffle is "
        "paid ONCE at write time, and every subsequent join or agg on "
        "the key plans with zero exchanges below the join "
        "(tests/test_plans.py pins shuffle_count == 1: only the final "
        "status agg shuffles). At 100 TB this is the difference between "
        "re-shuffling two fact tables per query and never shuffling "
        "them again. Oracle is the plain join — bucketing is layout, "
        "not semantics."
    ),
)
def join_bucketed(spark, sf_dir):
    import hashlib
    import os
    import tempfile

    from odl_etl_spark.io.bucketing import bucketed_join, write_bucketed

    # Path + table names are keyed by (application, sf_dir): a fixed
    # location raced when two sessions (e.g. the driver's correctness
    # gate and a concurrent bench) rebuilt the buckets simultaneously —
    # one process read files the other was overwriting.
    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}|{sf_dir}".encode()
    ).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"odl_etl_spark_buckets_{tag}")
    tl, to = f"b_lineitem_{tag}", f"b_orders_{tag}"
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderstatus"
    )
    write_bucketed(l, tl, "orderkey", 8, path=os.path.join(base, "l"))
    write_bucketed(o, to, "orderkey", 8, path=os.path.join(base, "o"))
    return (
        bucketed_join(spark, tl, to, "orderkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            roundn(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@spec(
    "join_skew_salted",
    """
    SELECT s.s_nationkey,
           COUNT(*) AS n_items,
           ROUND(SUM(l.l_quantity) * 100) / 100 AS sum_qty,
           ROUND(SUM(l.l_extendedprice) * 100) / 100 AS sum_price
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_nationkey
    """,
    doc=(
        "Skew-resistant fact⋈dim join via key salting "
        "(operators/skew.py): the fact side gets a round-robin salt, "
        "the dim side is exploded n_salts ways, so one pathological hot "
        "supplier key spreads over 8 shuffle buckets instead of "
        "hot-spotting a single reducer (the structural fallback when "
        "AQE's sort-merge-only skew split can't fire, e.g. broadcast-"
        "disabled shuffled-hash plans). Salting is internal only — the "
        "oracle is the PLAIN join: identical output is the correctness "
        "claim."
    ),
)
def join_skew_salted(spark, sf_dir):
    from odl_etl_spark.operators.skew import salted_join

    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    return (
        salted_join(l, s, on="suppkey", n_salts=8)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_items"),
            roundn(F.sum("l_quantity"), 2).alias("sum_qty"),
            roundn(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@spec(
    "join_fuzzy_match",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part),
    blocked AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             split_part(a.p_name, ' ', 2) AS block,
             levenshtein(a.p_name, b.p_name) AS lev
      FROM names a JOIN names b
        ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
       AND a.p_name < b.p_name
    )
    SELECT block, name_a, name_b, lev
    FROM blocked WHERE lev <= 3
    """,
    doc=(
        "Blocked fuzzy entity matching (the scalable entity-resolution "
        "shape, generalizing the reference's user/email identity "
        "mapping): dedupe to the distinct name VOCABULARY first "
        "(vocabulary is orders of magnitude smaller than rows at lake "
        "scale), equi-join on a blocking key (the name's noun) so "
        "candidate pairs are per-block instead of all-pairs, then verify "
        "candidates with levenshtein <= 3. Matches broadcast back to "
        "fact rows by exact name when needed. Never an all-pairs "
        "theta join - the levenshtein predicate rides an equi-join."
    ),
)
def join_fuzzy_match(spark, sf_dir):
    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.split("p_name", " ")[1].alias("block"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.split("p_name", " ")[1].alias("block"),
    )
    return (
        a.join(b, "block")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("lev", F.levenshtein("name_a", "name_b"))
        .where(F.col("lev") <= 3)
        .select("block", "name_a", "name_b", "lev")
    )


_LATERAL_SQL = """
    SELECT s.s_suppkey, s.s_name, t.l_orderkey, t.l_linenumber,
           ROUND(t.l_extendedprice * 100) / 100 AS price
    FROM supplier s,
    LATERAL (
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      WHERE l_suppkey = s.s_suppkey
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 2
    ) t
"""


@spec(
    "join_lateral_topk",
    _LATERAL_SQL,
    doc=(
        "Correlated LATERAL subquery with ORDER BY + LIMIT: for each "
        "supplier, its two highest-priced lineitems — per-key top-k "
        "expressed as a join (identical text on both engines). Spark "
        "decorrelates the lateral into a suppkey-keyed WindowGroupLimit "
        "(partial per-partition top-2 before the exchange) joined back "
        "to the outer row — NOT a per-outer-row re-execution and not a "
        "nested-loop join, so the shape scales like topk_per_group "
        "while keeping the SQL-surface ergonomics."
    ),
)
def join_lateral_topk(spark, sf_dir):
    from odl_etl_spark.io.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


SPECS = [
    join_inner_equi,
    join_full,
    subq_in,
    subq_scalar,
    join_broadcast,
    join_left,
    join_semi,
    join_anti,
    join_theta_range,
    join_multiway,
    join_asof,
    join_skew_salted,
    join_bucketed,
    join_fuzzy_match,
    join_lateral_topk,
]
