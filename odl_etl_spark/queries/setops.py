"""Sort / limit / top-k / set-operation specs (SURVEY §2B)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from odl_etl_spark.io.sources import load_table
from odl_etl_spark.queries.base import spec


@spec(
    "sort_limit",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    doc=(
        "Global order + limit. Catalyst plans TakeOrderedAndProject: each "
        "partition keeps its top-100, the driver merges — no global sort "
        "shuffle, which is exactly what survives at 100 TB."
    ),
)
def sort_limit(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@spec(
    "topk_per_group",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 5
    """,
    doc="Top-5 orders per market segment (window + filter, one shuffle).",
)
def topk_per_group(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
    )


@spec(
    "set_union",
    """
    SELECT c_custkey AS custkey, 'auto' AS src FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION ALL
    SELECT c_custkey AS custkey, 'rich' AS src FROM customer WHERE c_acctbal > 9000.0
    """,
    doc="Bag union (UNION ALL ≡ unionByName, no dedup shuffle).",
)
def set_union(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    auto = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey"), F.lit("auto").alias("src")
    )
    rich = c.where(F.col("c_acctbal") > 9000.0).select(
        F.col("c_custkey").alias("custkey"), F.lit("rich").alias("src")
    )
    return auto.unionByName(rich)


@spec(
    "set_intersect",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="Set intersection (distinct semantics).",
)
def set_intersect(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersect(finished)


@spec(
    "set_except",
    """
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="Bag difference (EXCEPT ALL ≡ exceptAll, multiplicity-aware).",
)
def set_except(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    all_cust = o.select(F.col("o_custkey").alias("custkey"))
    open_cust = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return all_cust.exceptAll(open_cust)


SPECS = [sort_limit, topk_per_group, set_union, set_intersect, set_except]
