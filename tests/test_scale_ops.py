"""Scale-posture operators: salted skew join, bucketed shuffle-free joins,
approx-quantile bounds, n-gram edge cases."""

from __future__ import annotations

import pyspark.sql.functions as F

from odl_etl_spark.functions.text import word_ngrams, word_shingles
from odl_etl_spark.io.bucketing import bucketed_join, write_bucketed
from odl_etl_spark.io.sources import load_table
from odl_etl_spark.operators.skew import salted_join
from odl_etl_spark.plans import shuffle_count


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(customer, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(orders, customer, "o_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_preserves_unmatched(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k long, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k long, d string")
    out = {r["k"]: r["d"] for r in salted_join(fact, dim, "k", n_salts=4, how="left").collect()}
    assert out == {1: "x", 2: "y", 99: None}


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    write_bucketed(orders, "b_orders", "custkey", n_buckets=8)
    write_bucketed(customer, "b_customer", "custkey", n_buckets=8)
    try:
        joined = bucketed_join(spark, "b_orders", "b_customer", "custkey")
        assert shuffle_count(joined) == 0  # bucket layout replaces the exchange
        plain = orders.join(customer, "custkey")
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_approx_quantile_within_bounds(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    approx = l.select(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50")
    ).head()["p50"]
    exact = l.select(F.expr("percentile(l_extendedprice, 0.5)").alias("p50")).head()["p50"]
    lo, hi = (
        l.where(F.col("l_extendedprice") <= exact).count(),
        l.count(),
    )
    # Approx p50 must sit within 1% of the exact rank position.
    rank = l.where(F.col("l_extendedprice") <= approx).count()
    assert abs(rank - lo) / hi < 0.01


def test_ngrams_short_doc_edge_cases(spark):
    df = spark.createDataFrame([("",), ("one",), ("one two",)], "text string")
    rows = df.select(
        word_ngrams("text", 3).alias("ng"), word_shingles("text", 3).alias("sh")
    ).collect()
    assert [list(r["ng"]) for r in rows] == [[], [], []]
    assert [list(r["sh"]) for r in rows] == [[], [], []]
    two = df.where(F.col("text") == "one two").select(word_ngrams("text", 2).alias("g")).head()
    assert list(two["g"]) == ["one two"]


def test_cluster_conf_scales_with_inputs():
    from odl_etl_spark.session import cluster_conf

    small = cluster_conf(total_cores=100, input_tb=1)
    big = cluster_conf(total_cores=4000, input_tb=100)
    assert int(big["spark.sql.shuffle.partitions"]) > int(
        small["spark.sql.shuffle.partitions"]
    )
    assert big["spark.sql.adaptive.enabled"] == "true"
    assert int(big["spark.sql.shuffle.partitions"]) <= 200_000


def test_salted_join_rejects_outer(spark):
    import pytest

    fact = spark.createDataFrame([(1, "a")], "k long, v string")
    dim = spark.createDataFrame([(1, "x")], "k long, d string")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, "k", how="full")
