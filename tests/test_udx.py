"""UDAF (applyInPandas) and UDTF tests — the non-query UDF surface."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from odl_etl_spark.functions.udx import TokenizeUDTF, register_udtfs, weighted_avg_udaf
from odl_etl_spark.io.sources import load_table


def test_weighted_avg_udaf_matches_expression(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    got = {
        r["l_returnflag"]: r["weighted_avg"]
        for r in weighted_avg_udaf(
            l, ["l_returnflag"], "l_extendedprice", "l_quantity"
        ).collect()
    }
    want = {
        r["l_returnflag"]: r["w"]
        for r in l.groupBy("l_returnflag")
        .agg(
            (F.sum(F.col("l_extendedprice") * F.col("l_quantity")) / F.sum("l_quantity")).alias("w")
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_udtf_explodes_tokens(spark):
    from pyspark.sql.functions import lit

    rows = TokenizeUDTF(lit("Spark makes  rows")).collect()
    assert [(r["term"], r["pos"]) for r in rows] == [
        ("spark", 0),
        ("makes", 1),
        ("rows", 2),
    ]


def test_udtf_from_sql(spark):
    register_udtfs(spark)
    rows = spark.sql("SELECT * FROM tokenize('a b c')").collect()
    assert len(rows) == 3
    assert rows[0]["term"] == "a"


def test_udtf_null_input_yields_nothing(spark):
    from pyspark.sql.functions import lit

    assert TokenizeUDTF(lit(None).cast("string")).collect() == []
