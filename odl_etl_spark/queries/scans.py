"""Scan / source / sink query specs (SURVEY §2B — A1/A3/A7/A8 classes).

Derivation: the reference's entire extract/load surface is a pushed-down
2-column JDBC SELECT (``email_mapping/email_mapping.py:43-48``), a Parquet
write (``:53-54``), and date-partitioned S3 sync
(``mitx/mitx_etl.py:124-155``). Spark-first form: declarative parquet
scans (Catalyst prunes columns and pushes predicates to the reader) and
``partitionBy`` writes with dynamic partition overwrite.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from odl_etl_spark.io.sinks import partitioned_write, session_sink_dir
from odl_etl_spark.io.sources import load_table, money_acc
from odl_etl_spark.functions.numeric import (
    LINEITEM_CHARGE_BOUND,
    ORDERS_TOTALPRICE_BOUND,
    roundn,
    sum_cents,
)
from odl_etl_spark.queries.base import spec


@spec(
    "scan_parquet",
    "SELECT * FROM part",
    doc="Full columnar scan, schema as-is (A1/A3).",
)
def scan_parquet(spark, sf_dir):
    return load_table(spark, sf_dir, "part")


@spec(
    "scan_pruned",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_quantity < 25 AND l_shipdate >= TIMESTAMP '1997-01-01'
    """,
    doc=(
        "Column-pruned, predicate-pushed scan: only 5 columns leave the "
        "parquet reader (ReadSchema) and both predicates reach "
        "PushedFilters — the generalized form of the reference's "
        "projection-by-SQL-string (email_mapping.py:44)."
    ),
)
def scan_pruned(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_quantity") < 25) & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@spec(
    "sink_partitioned",
    """
    SELECT STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m') AS ds, COUNT(*) AS n,
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 1e2 AS total
    FROM orders GROUP BY ds
    """,
    doc=(
        "Date-partitioned Parquet sink + partition-discovering re-read "
        "(A7 `aws s3 sync` to date prefixes + A8 prefix listing, "
        "mitx_etl.py:124-155 / manage_crawler_targets.py:3-6). Writes "
        "partitionBy(ds) with dynamic overwrite, re-reads via partition "
        "discovery, aggregates per partition."
    ),
)
def sink_partitioned(spark, sf_dir):
    out = session_sink_dir(spark, "orders_by_month")
    shutil.rmtree(out, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "ds", F.date_format("o_orderdate", "yyyy-MM")
    )
    # partitioned_write repartitions on the key first: each output
    # partition is written by one task (one right-sized file) instead of
    # every task writing a sliver of every partition — tasks×partitions
    # small files is the classic lake write anti-pattern. At larger
    # per-date volumes, files_per_partition salts the repartition to fan
    # each date over N writer tasks (see io/sinks.py).
    partitioned_write(orders, out, ("ds",))
    return (
        spark.read.parquet(out)
        .groupBy("ds")
        .agg(
            F.count("*").alias("n"),
            sum_cents(
                F.col("o_totalprice"),
                acc=money_acc(
                    spark, sf_dir, "orders", ORDERS_TOTALPRICE_BOUND, 10**2,
                    what="sink_partitioned total",
                ),
            ).alias("total"),
        )
        .select(F.col("ds").cast("string").alias("ds"), "n", "total")
    )


@spec(
    "sink_csv_roundtrip",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n,
           ROUND(SUM(c_acctbal) * 100) / 100 AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
    doc=(
        "CSV sink + re-read (headered, Spark-written shortest-roundtrip "
        "doubles re-parse exactly), then aggregate — proves the "
        "interchange-format path end-to-end, not just parquet. The "
        "re-read declares an explicit schema: schema inference is a "
        "full extra pass over the data and is banned at scale."
    ),
)
def sink_csv_roundtrip(spark, sf_dir):
    out = session_sink_dir(spark, "customer_csv")
    shutil.rmtree(out, ignore_errors=True)
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    c.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.schema("c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE")
        .option("header", True)
        .csv(out)
    )
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), roundn(F.sum("c_acctbal"), 2).alias("total_bal")
    )


@spec(
    "sink_jsonl_roundtrip",
    """
    SELECT p_brand,
           COUNT(*) AS n,
           ROUND(SUM(p_retailprice) * 100) / 100 AS total_price
    FROM part GROUP BY p_brand
    """,
    doc=(
        "JSON-lines sink + re-read with explicit schema, then aggregate "
        "— the log-interchange format path (the reference's mailgun "
        "events arrive as JSON; mitx_etl.py). Explicit schema on "
        "re-read for the same no-inference-pass reason as CSV."
    ),
)
def sink_jsonl_roundtrip(spark, sf_dir):
    out = session_sink_dir(spark, "part_jsonl")
    shutil.rmtree(out, ignore_errors=True)
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    p.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE"
    ).json(out)
    return back.groupBy("p_brand").agg(
        F.count("*").alias("n"), roundn(F.sum("p_retailprice"), 2).alias("total_price")
    )


@spec(
    "sink_orc_roundtrip",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n,
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 1e2 AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc=(
        "ORC sink + explicit-schema re-read, then aggregate — the third "
        "columnar interchange format after parquet/CSV/JSONL (ORC is the "
        "other first-class Hadoop columnar format; doubles round-trip "
        "bit-exactly). Explicit schema on re-read: no inference pass."
    ),
)
def sink_orc_roundtrip(spark, sf_dir):
    out = session_sink_dir(spark, "orders_orc")
    shutil.rmtree(out, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    o.write.mode("overwrite").orc(out)
    back = spark.read.schema(
        "o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE"
    ).orc(out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        sum_cents(
            F.col("o_totalprice"),
            acc=money_acc(
                spark, sf_dir, "orders", ORDERS_TOTALPRICE_BOUND, 10**2,
                what="sink_orc_roundtrip total_price",
            ),
        ).alias("total_price"),
    )


@spec(
    "sink_upsert",
    """
    WITH base AS (
      SELECT o_orderkey, STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m') AS ds,
             o_totalprice
      FROM orders
    ), upd AS (
      SELECT o_orderkey, ds, o_totalprice * 2 AS o_totalprice
      FROM base WHERE ds = '1995-06'
      UNION ALL
      SELECT o_orderkey + 10000000, ds, 111.0 FROM base WHERE ds = '1995-06'
    ), merged AS (
      SELECT * FROM base WHERE ds <> '1995-06'
      UNION ALL
      SELECT * FROM base
      WHERE ds = '1995-06'
        AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)
      UNION ALL
      SELECT * FROM upd
    )
    SELECT ds, COUNT(*) AS n,
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 1e2 AS total
    FROM merged GROUP BY ds
    """,
    doc=(
        "Partition-scoped upsert (operators/upsert.py): plain Parquet "
        "has no MERGE, so touched partitions are rewritten as "
        "kept-minus-matched ∪ updates and swapped atomically via "
        "per-write dynamic partition overwrite — untouched months are "
        "never read or written (at 100 TB a daily upsert touches the "
        "day's partitions, not the lake). The update batch doubles one "
        "month's totals and inserts synthetic new keys; the oracle "
        "reconstructs the merged lake state relationally."
    ),
)
def sink_upsert(spark, sf_dir):
    from odl_etl_spark.operators.upsert import upsert_partitioned

    out = session_sink_dir(spark, "orders_upsert")
    shutil.rmtree(out, ignore_errors=True)
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("ds"),
        "o_totalprice",
    )
    partitioned_write(base, out, ("ds",))
    month = base.where(F.col("ds") == "1995-06")
    upd = month.withColumn("o_totalprice", F.col("o_totalprice") * 2).unionByName(
        month.select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "ds",
            F.lit(111.0).alias("o_totalprice"),
        )
    )
    upsert_partitioned(spark, out, upd, keys=["o_orderkey"], partition_col="ds")
    return (
        spark.read.parquet(out)
        .groupBy(F.col("ds").cast("string").alias("ds"))
        .agg(
            F.count("*").alias("n"),
            sum_cents(
                F.col("o_totalprice"),
                acc=money_acc(
                    spark, sf_dir, "orders", ORDERS_TOTALPRICE_BOUND, 10**2,
                    what="sink_upsert total",
                ),
            ).alias("total"),
        )
    )


def _q3_sql(acc: str = "BIGINT") -> str:
    return f"""
    SELECT l_orderkey,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                    AS {acc})) / 1e4 AS revenue
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


_Q3_SQL = _q3_sql()


@spec(
    "sql_tpch_q3",
    _Q3_SQL,
    doc=(
        "ANSI SQL passthrough: the IDENTICAL query text runs on Spark "
        "(spark.sql over registered views) and on the DuckDB oracle — "
        "TPC-H Q3 shape. Demonstrates the raw SQL surface next to the "
        "DataFrame API. Revenue is a scaled-BIGINT sum (round-12 "
        "exposure audit): identical TEXT does not make a double SUM "
        "identical — each engine accumulates in its own partition/scan "
        "order — and here the ORDER BY ... LIMIT 10 cut additionally "
        "rides on revenue, so near-tie float noise could even reorder "
        "the emitted rows; exact integer revenue makes both the values "
        "and the cut deterministic (the sql_tpch_q5 convention)."
    ),
)
def sql_tpch_q3(spark, sf_dir):
    from odl_etl_spark.io.sources import register_views

    acc = money_acc(
        spark, sf_dir, "lineitem", LINEITEM_CHARGE_BOUND, 10**4,
        what="sql_tpch_q3 revenue",
    ).upper()
    register_views(spark, sf_dir)
    return spark.sql(_q3_sql(acc))


_ZBITS = 8  # bits interleaved per key → 16-bit z-value


def _z_sql(p: str, s: str) -> str:
    terms = []
    for i in range(_ZBITS):
        terms.append(f"(({p} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({s} // {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


@spec(
    "sort_zorder",
    f"""
    WITH b AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             l_partkey % {1 << _ZBITS} AS p8, l_suppkey % {1 << _ZBITS} AS s8
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST({_z_sql('p8', 's8')} AS BIGINT) AS zval
    FROM b
    ORDER BY zval ASC, l_orderkey ASC, l_linenumber ASC LIMIT 100
    """,
    doc=(
        "Z-order (Morton) clustering key over (l_partkey, l_suppkey): "
        "interleave 8 bits of each key into one 16-bit zval, then a "
        "distributed TakeOrderedAndProject. The zval expression is the "
        "data-LAYOUT primitive: writing files sorted by zval co-locates "
        "rows close in BOTH dimensions, so min/max parquet row-group "
        "stats prune scans with predicates on either key — the "
        "multi-dimensional generalization of the reference's "
        "date-prefix layout (mitx_etl.py:138). Pure integer bit "
        "arithmetic (shift/mod), codegen'd, shuffle-free before the "
        "top-k cut; identical digit semantics in both engines."
    ),
)
def sort_zorder(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p8 = F.col("l_partkey") % (1 << _ZBITS)
    s8 = F.col("l_suppkey") % (1 << _ZBITS)
    z = None
    for i in range(_ZBITS):
        for src, off in ((p8, 1), (s8, 0)):
            bit = F.shiftleft(
                ((src / (1 << i)).cast("bigint") % 2), 2 * i + off
            )
            z = bit if z is None else z + bit
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            z.cast("bigint").alias("zval"),
        )
        .orderBy(
            F.col("zval").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
        )
        .limit(100)
    )


SPECS = [
    scan_parquet,
    scan_pruned,
    sink_partitioned,
    sink_csv_roundtrip,
    sink_jsonl_roundtrip,
    sink_orc_roundtrip,
    sink_upsert,
    sql_tpch_q3,
    sort_zorder,
]
