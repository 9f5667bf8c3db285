"""Projection / filter / scalar-function specs (SURVEY §2B, A2 class).

The reference's only transform is a per-row salted SHA-256
(``email_mapping/email_mapping.py:49-51``); this module re-expresses it as
a codegen'd expression and widens the scalar surface to the full string /
date / math / JSON / array / map families the downstream lake implies.
All pure expression work — whole-stage codegen, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from odl_etl_spark.functions.hashing import DEFAULT_SALT, salted_sha256
from odl_etl_spark.functions.numeric import roundn
from odl_etl_spark.io.sources import load_table
from odl_etl_spark.queries.base import spec


@spec(
    "project_hash_email",
    f"""
    SELECT c_custkey, sha256('{DEFAULT_SALT}' || c_name) AS hashed_id
    FROM customer
    """,
    doc=(
        "The reference's flagship user-map, verbatim semantics "
        "(email_mapping.py:49-51: sha256(salt+email).hexdigest per row) as "
        "a distributed codegen'd expression over customer.c_name."
    ),
)
def project_hash_email(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", salted_sha256("c_name").alias("hashed_id")
    )


@spec(
    "filter_pred",
    """
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    WHERE (c_acctbal > 5000.0 AND c_mktsegment IN ('AUTOMOBILE', 'MACHINERY'))
       OR c_acctbal < -500.0
    """,
    doc="Conjunctive/disjunctive predicates, pushed to the scan (A1 class).",
)
def filter_pred(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.where(
        ((F.col("c_acctbal") > 5000.0) & F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"))
        | (F.col("c_acctbal") < -500.0)
    ).select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")


@spec(
    "scalar_string",
    """
    SELECT p_partkey,
           LOWER(p_brand) AS brand_lc,
           UPPER(p_name) AS name_uc,
           SUBSTRING(p_name, 1, 4) AS name_pfx,
           CONCAT(p_type, '/', p_brand) AS type_brand,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
           TRIM(CONCAT(' ', p_name, ' ')) AS name_trim,
           CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS is_red
    FROM part
    """,
    doc="String scalar family: lower/upper/substring/concat/regexp/trim/like.",
)
def scalar_string(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_brand").alias("brand_lc"),
        F.upper("p_name").alias("name_uc"),
        F.substring("p_name", 1, 4).alias("name_pfx"),
        F.concat("p_type", F.lit("/"), "p_brand").alias("type_brand"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.when(F.col("p_name").like("%red%"), 1).otherwise(0).alias("is_red"),
    )


@spec(
    "scalar_date",
    """
    SELECT o_orderkey,
           STRFTIME(CAST(o_orderdate AS DATE), '%Y%m%d') AS ds,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
    FROM orders
    """,
    doc=(
        "Date scalar family; ds is the reference's daily-partition key "
        "format %Y%m%d (mitx_etl.py:16-17)."
    ),
)
def scalar_date(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMdd").alias("ds"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since"),
    )


@spec(
    "scalar_math",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * 100) / 100 AS revenue,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) / 100 AS charged,
           ABS(l_quantity - 25) AS qty_dev,
           ROUND(LN(l_extendedprice + 1) * 100) / 100 AS log_price,
           CASE WHEN l_quantity > 30 THEN 'bulk'
                WHEN l_quantity > 10 THEN 'mid'
                ELSE 'small' END AS qty_band
    FROM lineitem
    """,
    doc="Arithmetic/round/abs/ln/CASE — the lake-analytics expression core.",
)
def scalar_math(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        roundn(rev, 2).alias("revenue"),
        roundn(rev * (1 + F.col("l_tax")), 2).alias("charged"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        roundn(F.log(F.col("l_extendedprice") + 1), 2).alias("log_price"),
        F.when(F.col("l_quantity") > 30, "bulk")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
    )


@spec(
    "scalar_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    """,
    doc="Typed field extraction from a JSON string column (events.props).",
)
def scalar_json(spark, sf_dir):
    from odl_etl_spark.io.sources import spread

    e = spread(load_table(spark, sf_dir, "events"))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@spec(
    "scalar_array",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE) * 10000) / 10000 AS first_val,
           ROUND(CAST(embedding[len(embedding)] AS DOUBLE) * 10000) / 10000 AS last_val,
           ROUND((SELECT SUM(CAST(x AS DOUBLE)) FROM UNNEST(embedding) AS t(x)) * 10000) / 10000 AS vec_sum
    FROM embeddings
    """,
    doc="Array ops over embeddings.embedding: size/element_at/aggregate sum.",
)
def scalar_array(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        roundn(F.element_at(dbl, 1), 4).alias("first_val"),
        roundn(F.element_at(dbl, F.size("embedding")), 4).alias("last_val"),
        roundn(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
    )


@spec(
    "scalar_map",
    """
    SELECT doc_id,
           '{"lang":"' || lang || '","source":"' || source || '"}' AS meta_json,
           lang AS meta_lang,
           'lang,source' AS meta_keys
    FROM documents
    """,
    doc=(
        "Build + query a MapType column (create_map / element access / "
        "keys), serialized to scalar columns (to_json / concat_ws) so the "
        "output is engine-comparable and hashable. The oracle constructs "
        "the identical compact-JSON string literally (lang/source are "
        "quote-free enum tokens in the fixture)."
    ),
)
def scalar_map(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.to_json(m).alias("meta_json"),
        m["lang"].alias("meta_lang"),
        F.concat_ws(",", F.map_keys(m)).alias("meta_keys"),
    )


@spec(
    "udf_scalar_pandas",
    f"""
    SELECT c_custkey, sha256('{DEFAULT_SALT}' || c_name) AS hashed_id
    FROM customer
    """,
    doc=(
        "The reference's Series.apply hash (email_mapping.py:49-51) done "
        "right: an Arrow-vectorized pandas UDF. Same bytes as project_hash_"
        "email; exists to exercise the Python-UDF execution path."
    ),
)
def udf_scalar_pandas(spark, sf_dir):
    from odl_etl_spark.functions.pandas_udfs import salted_sha256_udf

    hash_series = salted_sha256_udf(DEFAULT_SALT)
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", hash_series("c_name").alias("hashed_id")
    )


@spec(
    "udaf_regression",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity) * 100) / 100
             AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity) * 100) / 100
             AS intercept
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Grouped pandas UDAF (applyInPandas): per-group OLS fit of "
        "extendedprice on quantity — the 'custom aggregate the built-ins "
        "don't have' path, Arrow-batched, one group per pandas frame. "
        "Centered two-pass sums in float64 match DuckDB's regr_slope/"
        "regr_intercept to well under the 2-decimal rounding. At 100 TB "
        "the group count (not group size) bounds parallelism — for "
        "high-cardinality keys this shape scales out; for few huge "
        "groups prefer an algebraic reformulation into built-in sums."
    ),
)
def udaf_regression(spark, sf_dir):
    import pandas as pd  # noqa: F401

    e = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )

    def fit(pdf):
        import numpy as np
        import pandas as pd

        x = pdf["l_quantity"].to_numpy(dtype="float64")
        y = pdf["l_extendedprice"].to_numpy(dtype="float64")
        xm, ym = x.mean(), y.mean()
        sxx = ((x - xm) ** 2).sum()
        slope = ((x - xm) * (y - ym)).sum() / sxx
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n": [len(pdf)],
                "slope": [slope],
                "intercept": [ym - slope * xm],
            }
        )

    fitted = e.groupBy("l_returnflag").applyInPandas(
        fit, "l_returnflag string, n bigint, slope double, intercept double"
    )
    return fitted.select(
        "l_returnflag",
        "n",
        roundn(F.col("slope"), 2).alias("slope"),
        roundn(F.col("intercept"), 2).alias("intercept"),
    )


@spec(
    "scalar_null",
    """
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'AUTOMOBILE'), 'OTHER') AS seg_or_other,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS pos_bal,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0)
             AS pos_bal_filled,
           (c_acctbal < 0) AS is_debtor
    FROM customer
    """,
    doc="Null-handling family: coalesce / nullif / null-producing CASE.",
)
def scalar_null(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    pos_bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("OTHER")
        ).alias("seg_or_other"),
        pos_bal.alias("pos_bal"),
        F.coalesce(pos_bal, F.lit(0.0)).alias("pos_bal_filled"),
        (F.col("c_acctbal") < 0).alias("is_debtor"),
    )


@spec(
    "explode_posexplode",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), e AS (
      SELECT 0 AS pos, toks[1] AS tok FROM t WHERE len(toks) >= 1
      UNION ALL SELECT 1, toks[2] FROM t WHERE len(toks) >= 2
      UNION ALL SELECT 2, toks[3] FROM t WHERE len(toks) >= 3
      UNION ALL SELECT 3, toks[4] FROM t WHERE len(toks) >= 4
      UNION ALL SELECT 4, toks[5] FROM t WHERE len(toks) >= 5
    )
    SELECT pos, COUNT(*) AS n_docs, COUNT(DISTINCT tok) AS n_tokens
    FROM e GROUP BY pos
    """,
    doc=(
        "Lateral explode with ordinality: posexplode over the first five "
        "tokens of each document (slice before explode, so the generator "
        "emits 5 rows/doc, not |tokens|), then positional vocabulary "
        "stats. The 1-row→N-rows generator runs inside whole-stage "
        "codegen; the slice bounds the fan-out, which is what keeps a "
        "generate step safe on 100 TB of long documents."
    ),
)
def explode_posexplode(spark, sf_dir):
    from odl_etl_spark.functions import text as T

    d = load_table(spark, sf_dir, "documents")
    ex = d.select(
        F.posexplode(F.slice(T.tokens("text"), 1, 5)).alias("pos", "tok")
    )
    return ex.groupBy("pos").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("tok").alias("n_tokens"),
    )


@spec(
    "scalar_variant",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val,
           json_extract_string(props, '$.k') IS NOT NULL AS has_k
    FROM events
    """,
    doc=(
        "Semi-structured processing via the VARIANT type (Spark 4): "
        "parse_json once into a binary variant, then typed "
        "variant_get / try_variant_get extractions and presence "
        "checks against it. The scale contrast with scalar_json's "
        "get_json_object: string-path functions re-parse the JSON "
        "text PER CALL, while a variant column parses once and every "
        "extraction is a binary offset walk (and columnar shredding "
        "can push typed paths to storage). Values are engine-"
        "identical, so the oracle is DuckDB's JSON surface."
    ),
)
def scalar_variant(spark, sf_dir):
    from odl_etl_spark.io.sources import spread

    e = spread(load_table(spark, sf_dir, "events"))
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return e.select(
        "event_id",
        k.alias("k_val"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_val"),
        k.isNotNull().alias("has_k"),
    )


SPECS = [
    project_hash_email,
    filter_pred,
    scalar_null,
    scalar_string,
    scalar_date,
    scalar_math,
    scalar_json,
    scalar_array,
    scalar_map,
    udf_scalar_pandas,
    udaf_regression,
    explode_posexplode,
    scalar_variant,
]
