"""Property-based spot checks (SURVEY §5.2 item 3): algebraic identities
of the engine's operators, and byte-equivalence of the flagship hash with
the reference's hashlib semantics."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from odl_etl_spark.functions.hashing import DEFAULT_SALT, salted_sha256
from odl_etl_spark.io.sources import load_table


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_salted_hash_matches_hashlib(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = [r["h"] for r in df.select(salted_sha256("name").alias("h")).collect()]
    want = [
        hashlib.sha256((DEFAULT_SALT + n).encode("utf-8")).hexdigest() for n in names
    ]
    assert got == want


def test_filter_conjunction_equivalence(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    p, q = F.col("l_quantity") > 10, F.col("l_discount") < 0.05
    assert l.where(p & q).count() == l.where(p).where(q).count()


def test_union_count_additive(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O")
    b = o.where(F.col("o_orderstatus") != "O")
    assert a.unionByName(b).count() == o.count()


def test_dedup_idempotent(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    once = d.dropDuplicates(["text"])
    assert once.count() == once.dropDuplicates(["text"]).count()


def test_exceptall_inverse_of_unionall(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    doubled = c.unionByName(c)
    assert doubled.exceptAll(c).count() == c.count()


def test_topk_is_prefix_of_full_sort(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    full = [
        r["o_orderkey"]
        for r in o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(50).collect()
    ]
    k10 = [
        r["o_orderkey"]
        for r in o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(10).collect()
    ]
    assert full[:10] == k10


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(-1000, 1000)),
        min_size=5,
        max_size=400,
    ),
    st.integers(2, 11),
)
def test_global_ranking_exact_on_random_draws(spark, rows, parts):
    """The two-level rank must produce the exact permutation under ANY
    data distribution and partition count — the round-4 ranking bug
    (inconsistent sampled range boundaries between the window branch
    and the counts branch) was distribution-dependent: invisible at
    sf0.01, corrupting ~1% of ranks at sf0.1. Random keyed draws with
    heavy ties are the regression net for that class."""
    from odl_etl_spark.operators.ranking import global_cumsum, global_row_number

    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, key long, v long")
    ranked = global_row_number(df, ["key", "id"], rn_col="rn", num_partitions=parts)
    got = {r["id"]: r["rn"] for r in ranked.collect()}
    order = sorted(data, key=lambda t: (t[1], t[0]))
    want = {t[0]: i + 1 for i, t in enumerate(order)}
    assert got == want

    cum = global_cumsum(df, ["key", "id"], "v", cum_col="c", num_partitions=parts)
    gotc = {r["id"]: r["c"] for r in cum.collect()}
    run, wantc = 0, {}
    for t in order:
        wantc[t[0]] = run
        run += t[2]
    assert gotc == wantc
