"""Round-3 operator specs: TPC-H report shapes, corpus quality filters,
containment similarity, interval joins, RFM/cohort analytics, weighted
aggregates, robust outliers, PQ codebooks, and backlog prefix sums.

Derivation: the reference's ETL surface (mitodl/odl-etl mitx_etl.py
course exports, email_mapping.py user maps) feeds BI-style reporting and
corpus curation; these specs are the canonical 100 TB generalizations of
those report/curation shapes, each paired with a DuckDB oracle.

Determinism posture (the r2 `emb_covariance` lesson): every double SUM
that crosses an aggregation boundary is accumulated as scaled BIGINTs —
``SUM(CAST(ROUND(x * 10^k) AS BIGINT))`` on both engines — because
float addition is not associative and Spark's partial aggs sum in a
different order than the oracle. Per-row double arithmetic (products,
sqrt, ln) is identical on both engines; only cross-row accumulation
needs the integer trick.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from odl_etl_spark.functions import text as T
from odl_etl_spark.functions.numeric import (
    LINEITEM_CHARGE_BOUND,
    LINEITEM_PRICEQTY_BOUND,
    ORDERS_TOTALPRICE_BOUND,
    assert_scaled_sum_headroom,
    cents,
    roundn,
    scaled_sum_acc_type,
)
from odl_etl_spark.io.sources import cached_count, load_table, register_views, spread
from odl_etl_spark.operators.materialize import materialize
from odl_etl_spark.queries.base import spec

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"


def _lineitem_money_acc(spark, sf_dir, what: str, scale: int = 10**4) -> str:
    """SUM accumulator for lineitem money terms: BIGINT to the last
    provably-exact row, DECIMAL(38,0) past it (scaled_sum_acc_type —
    the tpch.py `_money_acc` posture; the oracle text stays BIGINT,
    which is the plan at every driver-checked scale)."""
    return scaled_sum_acc_type(
        cached_count(spark, sf_dir, "lineitem"), LINEITEM_CHARGE_BOUND, scale, what=what
    ).upper()


def _orders_money_acc(spark, sf_dir, what: str, scale: int = 10**2) -> str:
    """Same for o_totalprice sums (bound: an order totals <= 7 lineitem
    charges — functions/numeric.ORDERS_TOTALPRICE_BOUND); margin-2
    ceiling ~5.8e10 orders rows, genuinely reachable at ~100 TB."""
    return scaled_sum_acc_type(
        cached_count(spark, sf_dir, "orders"), ORDERS_TOTALPRICE_BOUND, scale, what=what
    ).upper()

# --------------------------------------------------------------------------
# TPC-H report shapes (SQL passthrough: the IDENTICAL text runs on Spark
# and DuckDB — integer-scaled money sums keep the hash reproducible)
# --------------------------------------------------------------------------

def _q1_sql(acc: str = "BIGINT") -> str:
    """Q1 text with the scaled-sum ACCUMULATOR type as the only
    parameter. The oracle always takes the default BIGINT text (the
    exact text the driver hashes at every checked scale); the Spark
    builder swaps in DECIMAL(38,0) past the int64 headroom ceiling
    (functions/numeric.scaled_sum_acc_type) so the flagship keeps
    running exactly at lake scale instead of refusing. The outer
    sum_qty CAST stays BIGINT in both modes — result schema identical."""
    return f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS {acc})) AS BIGINT)
             AS sum_qty,
           SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS {acc})) / 1e2
             AS sum_base_price,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                    AS {acc})) / 1e4 AS sum_disc_price,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                          * 1000000 + 0.5) AS {acc})) / 1e6 AS sum_charge,
           ROUND(SUM(CAST(FLOOR(l_quantity + 0.5) AS {acc})) * 1e2
                 / COUNT(*)) / 100 AS avg_qty,
           ROUND(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS {acc})) * 1e0
                 / COUNT(*)) / 100 AS avg_price,
           ROUND(SUM(CAST(FLOOR(l_discount * 10000 + 0.5) AS {acc})) * 1e0
                 / COUNT(*)) / 10000 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


_Q1_SQL = _q1_sql()


@spec(
    "sql_tpch_q1",
    _Q1_SQL,
    doc=(
        "TPC-H Q1 pricing summary as ANSI passthrough (same text, both "
        "engines). The classic full-scan + tiny-group agg: Catalyst "
        "plans a partial/final HashAggregate with map-side combine over "
        "6 groups, so shuffle traffic is O(groups x tasks) regardless "
        "of fact size. Money sums are scaled-BIGINT for cross-engine "
        "hash stability, quantized with the floor(x*scale+0.5) fast "
        "path (functions/numeric.cents convention; Spark ROUND(double) "
        "is BigDecimal-routed — the round-12 A/B measured 1.69s vs "
        "0.81s warm on this five-column shape, identical values)."
    ),
)
def sql_tpch_q1(spark, sf_dir):
    register_views(spark, sf_dir)
    # Worst scaled term: l_extendedprice·(1-disc)·(1+tax)·1e6 at the
    # derived TPC-H bound (LINEITEM_CHARGE_BOUND ≈ 113,400; ADVICE r12
    # #3) ≈ 1.1e11 per row, and one (returnflag, linestatus) group can
    # see nearly every lineitem row — bound on the table count
    # (metadata-only parquet count). Past the margin-2 widening ceiling
    # (~40.7M rows — the last provably-exact int64 row) the Spark-side
    # accumulators WIDEN to DECIMAL(38,0) (still exact integer sums,
    # identical result schema, measured x5 slower — scaled_sum_acc_type)
    # instead of wrapping silently or refusing; the oracle keeps the
    # BIGINT text, which is what runs at every driver-checked scale.
    acc = _lineitem_money_acc(spark, sf_dir, "sql_tpch_q1 sum_charge", scale=10**6)
    return spark.sql(_q1_sql(acc))


def _q5_sql(acc: str = "BIGINT") -> str:
    return f"""
    SELECT n_name,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS {acc}))
             / 1e4 AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""


_Q5_SQL = _q5_sql()


@spec(
    "sql_tpch_q5",
    _Q5_SQL,
    doc=(
        "TPC-H Q5 local-supplier volume: the 6-way star join. Catalyst "
        "broadcast-joins the dims (region/nation/supplier/customer fit "
        "under the broadcast threshold at any realistic scale-out) and "
        "shuffle-joins only orders x lineitem on orderkey; AQE reorders "
        "as stats arrive. Passthrough text identical on both engines."
    ),
)
def sql_tpch_q5(spark, sf_dir):
    acc = _lineitem_money_acc(spark, sf_dir, "sql_tpch_q5 revenue")
    register_views(spark, sf_dir)
    return spark.sql(_q5_sql(acc))


_Q18_SQL = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) > 300)
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
"""


@spec(
    "sql_tpch_q18",
    _Q18_SQL,
    doc=(
        "TPC-H Q18 large-volume customers: aggregate-driven semi-join "
        "(IN over a HAVING subquery). Spark rewrites the IN to a "
        "LeftSemi shuffle join keyed on orderkey — no materialized "
        "intermediate — then TakeOrdered caps the report at 100 rows."
    ),
)
def sql_tpch_q18(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(_Q18_SQL)


# --------------------------------------------------------------------------
# Corpus quality filters (Gopher / C4 heuristic families)
# --------------------------------------------------------------------------

_STOPS = ("the", "a", "of", "and", "is", "in", "to")
_STOPS_SQL = "[" + ", ".join(f"'{s}'" for s in _STOPS) + "]"


@spec(
    "quality_gopher",
    f"""
    WITH w AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), m AS (
      SELECT doc_id, len(toks) AS n_words,
             ROUND((list_sum(list_transform(toks, t -> length(t))) * 1.0
                    / len(toks)) * 100) / 100 AS mean_word_len,
             ROUND((len(list_filter(toks, t -> list_contains({_STOPS_SQL}, t)))
                    * 1.0 / len(toks)) * 10000) / 10000 AS stop_ratio
      FROM w WHERE len(toks) > 0
    )
    SELECT doc_id, n_words, mean_word_len, stop_ratio,
           (n_words >= 50 AND n_words <= 100000
            AND mean_word_len >= 3 AND mean_word_len <= 10
            AND stop_ratio >= 0.005) AS keep
    FROM m
    """,
    doc=(
        "Gopher-style document quality rules (Rae et al. 2021 family): "
        "word count window, mean-word-length window, stopword-presence "
        "floor. One codegen'd projection per document — no shuffle at "
        "all, so it streams at scan speed over any corpus size. Flags "
        "are derived from the ROUNDED metrics on both engines so the "
        "boundary comparisons are bit-identical."
    ),
)
def quality_gopher(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    d = d.select("doc_id", toks.alias("toks")).where(F.size("toks") > 0)
    total_len = F.aggregate(
        F.transform(F.col("toks"), lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n_stop = F.size(F.filter(F.col("toks"), lambda t: t.isin(*_STOPS)))
    m = d.select(
        "doc_id",
        F.size("toks").alias("n_words"),
        roundn(total_len * F.lit(1.0) / F.size("toks"), 2).alias("mean_word_len"),
        roundn(n_stop * F.lit(1.0) / F.size("toks"), 4).alias("stop_ratio"),
    )
    return m.select(
        "*",
        (
            (F.col("n_words") >= 50)
            & (F.col("n_words") <= 100000)
            & (F.col("mean_word_len") >= 3)
            & (F.col("mean_word_len") <= 10)
            & (F.col("stop_ratio") >= 0.005)
        ).alias("keep"),
    )


@spec(
    "corpus_filter_c4",
    f"""
    WITH w AS (
      SELECT doc_id, source, {_TOKS_SQL} AS toks, text FROM documents
    ), f AS (
      SELECT source,
             (len(toks) >= 100
              AND list_contains(toks, 'the')
              AND NOT contains(text, '{{')
              AND NOT contains(lower(text), 'lorem ipsum')
              AND len(list_filter(toks, t -> length(t) > 15)) = 0) AS keep
      FROM w
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND((SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 1.0 / COUNT(*))
                 * 10000) / 10000 AS keep_rate
    FROM f GROUP BY source
    """,
    doc=(
        "C4-style heuristic corpus filter (Raffel et al. 2020 family): "
        "minimum length, English marker token, code/boilerplate "
        "markers, runaway-token guard — reported as per-source keep "
        "rates (the curation dashboard shape). Filter is a pure "
        "projection; the only shuffle is the tiny per-source agg."
    ),
)
def corpus_filter_c4(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    keep = (
        (F.size(toks) >= 100)
        & F.array_contains(toks, "the")
        & ~F.col("text").contains("{")
        & ~F.lower(F.col("text")).contains("lorem ipsum")
        & (F.size(F.filter(toks, lambda t: F.length(t) > 15)) == 0)
    )
    return (
        d.select("source", keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
            roundn(
                F.sum(F.when(F.col("keep"), 1).otherwise(0)) * F.lit(1.0)
                / F.count("*"),
                4,
            ).alias("keep_rate"),
        )
    )


# --------------------------------------------------------------------------
# n-gram containment similarity (asymmetric near-dup: is A inside B?)
# --------------------------------------------------------------------------


@spec(
    "text_ngram_containment",
    f"""
    WITH w AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len({_TOKS_SQL}) - 2),
               i -> concat_ws(' ', {_TOKS_SQL}[i], {_TOKS_SQL}[i+1],
                              {_TOKS_SQL}[i+2]))) AS sh
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sa, b.sh AS sb
      FROM (SELECT doc_id, sh, UNNEST([doc_id + 1, doc_id + 2, doc_id + 3])
                   AS nbr FROM w) a
      JOIN w b ON b.doc_id = a.nbr
      WHERE len(a.sh) > 0
    )
    SELECT doc_a, doc_b,
           ROUND((len(list_intersect(sa, sb)) * 1.0
                  / len(sa)) * 10000) / 10000 AS containment
    FROM pairs
    """,
    doc=(
        "Containment similarity |A∩B|/|A| over distinct word-3-gram "
        "shingle sets — the asymmetric cousin of Jaccard (detects "
        "quotes/excerpts where Jaccard stays low; Broder 1997). "
        "Candidate pairs here are the deterministic neighbor window "
        "(doc_id +1..+3) so the oracle is exact; at 100 TB the pair "
        "source is the banded MinHash-LSH candidates from `dedup_near` "
        "(operators/dedup.py:216) — the metric and the equi-join "
        "evaluation shape are identical. Explode-to-equi-join keeps it "
        "a keyed shuffle join, never a range/theta join."
    ),
)
def text_ngram_containment(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # Materialize the shingle table once: it feeds BOTH join sides, and
    # without a lineage cut Catalyst re-executes the (expensive)
    # split/transform/distinct pipeline per reference — and pushes the
    # size()>0 filter below the project, evaluating it a third time in
    # the predicate. Same posture as dedup_cluster; cut mode switchable
    # at runtime for the corpus-sized table (operators/materialize.py).
    w = materialize(
        spread(d).select("doc_id", T.word_shingles("text", 3).alias("sh"))
    )
    a = (
        w.where(F.size("sh") > 0)
        .select(
            F.col("doc_id").alias("doc_a"),
            F.col("sh").alias("sa"),
            F.explode(
                F.array(*[F.col("doc_id") + k for k in (1, 2, 3)])
            ).alias("nbr"),
        )
    )
    b = w.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb"))
    # Hash-based set intersection (shingle lists are already distinct);
    # the previous filter+array_contains was an O(|sa|·|sb|) nested loop
    # per candidate pair (VERDICT.md r3 What's-wrong #4).
    inter = F.size(F.array_intersect("sa", "sb"))
    return a.join(b, a.nbr == b.doc_b).select(
        "doc_a",
        "doc_b",
        roundn(inter * F.lit(1.0) / F.size("sa"), 4).alias("containment"),
    )


# --------------------------------------------------------------------------
# embedding norm statistics
# --------------------------------------------------------------------------


@spec(
    "emb_norm_stats",
    """
    WITH n AS (
      SELECT label,
             CAST(ROUND(sqrt(list_sum(list_transform(embedding,
                    x -> CAST(ROUND(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              * 1000000000) AS BIGINT)))
                  / 1000000000.0) * 1000000) AS BIGINT) AS nq
      FROM embeddings
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(SUM(nq) * 1.0 / COUNT(*) / 1000000 * 10000) / 10000 AS avg_norm,
           MIN(nq) / 1000000.0 AS min_norm,
           MAX(nq) / 1000000.0 AS max_norm
    FROM n GROUP BY label
    """,
    doc=(
        "Per-label L2-norm distribution of the embedding corpus — the "
        "sanity dashboard before any cosine math (un-normalized vectors "
        "silently break dot-product ANN). Per-row: squared terms are "
        "scaled-BIGINT summed inside the array fold (order-free), then "
        "sqrt; cross-row: the per-row norm is quantized to 1e-6 before "
        "min/max/avg so every aggregate is integer arithmetic. Pure "
        "map + 10-group agg: scan-speed at any scale."
    ),
)
def emb_norm_stats(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # Per-row array fold of x²·1e9 terms over the embedding dimension;
    # 65536 dims at |x| ≤ 4 is a static bound with ample headroom.
    assert_scaled_sum_headroom(
        65536, 16.0, 10**9, what="emb_norm_stats per-row squared-term sum"
    )
    ssq = F.aggregate(
        F.transform(
            F.col("v"),
            lambda x: F.round(x * x * F.lit(1000000000.0)).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    nq = F.round(F.sqrt(ssq / F.lit(1000000000.0)) * F.lit(1000000.0)).cast("bigint")
    return (
        e.select("label", nq.alias("nq"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            roundn(
                F.sum("nq") * F.lit(1.0) / F.count("*") / F.lit(1000000.0), 4
            ).alias("avg_norm"),
            (F.min("nq") / F.lit(1000000.0)).alias("min_norm"),
            (F.max("nq") / F.lit(1000000.0)).alias("max_norm"),
        )
    )


# --------------------------------------------------------------------------
# interval-overlap self join
# --------------------------------------------------------------------------


@spec(
    "join_interval_overlap",
    """
    SELECT o1.o_custkey AS custkey, COUNT(*) AS n_overlaps
    FROM orders o1 JOIN orders o2
      ON o1.o_custkey = o2.o_custkey
     AND o1.o_orderkey < o2.o_orderkey
     AND o2.o_orderdate < o1.o_orderdate + INTERVAL 30 DAY
     AND o1.o_orderdate < o2.o_orderdate + INTERVAL 30 DAY
    GROUP BY o1.o_custkey
    ORDER BY n_overlaps DESC, custkey
    LIMIT 100
    """,
    doc=(
        "Interval-overlap self-join: orders whose 30-day fulfillment "
        "windows overlap for the same customer (the temporal-join shape "
        "behind session stitching and resource-contention queries). The "
        "customer equi-key drives a keyed SortMergeJoin — the interval "
        "predicates are post-join filters within each key group, so "
        "there is NO banded/theta blowup; per-key fanout is bounded by "
        "orders-per-customer. TakeOrdered caps the report."
    ),
)
def join_interval_overlap(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    o1 = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k1"),
        F.col("o_orderdate").alias("d1"),
    )
    o2 = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k2"),
        F.col("o_orderdate").alias("d2"),
    )
    ivl = F.expr("INTERVAL 30 DAYS")
    joined = o1.join(o2, "custkey").where(
        (F.col("k1") < F.col("k2"))
        & (F.col("d2") < F.col("d1") + ivl)
        & (F.col("d1") < F.col("d2") + ivl)
    )
    return (
        joined.groupBy("custkey")
        .agg(F.count("*").alias("n_overlaps"))
        .orderBy(F.col("n_overlaps").desc(), F.col("custkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# RFM segmentation
# --------------------------------------------------------------------------


@spec(
    "events_rfm",
    """
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             date_diff('day', MAX(o_orderdate), TIMESTAMP '2001-08-02')
               AS rec_days,
             COUNT(*) AS freq,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS monet_c
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey, rec_days, freq, monet_c / 100.0 AS monetary,
           NTILE(5) OVER (ORDER BY rec_days ASC, custkey ASC) AS r_score,
           NTILE(5) OVER (ORDER BY freq DESC, custkey ASC) AS f_score,
           NTILE(5) OVER (ORDER BY monet_c DESC, custkey ASC) AS m_score
    FROM rfm
    """,
    doc=(
        "RFM (recency / frequency / monetary) customer segmentation — "
        "the classic lifecycle-marketing report. Each score is an exact "
        "NTILE(5) under a total order (tie-break on custkey), computed "
        "with the distributed two-level rank from operators/ranking.py "
        "(range shuffle -> per-partition row_number -> O(partitions)-row "
        "offset table) — NO unpartitioned window over the customer "
        "dimension, which is exactly the window that dies at 1e9 "
        "customers. Money accumulates as scaled BIGINT cents."
    ),
)
def events_rfm(spark, sf_dir):
    from odl_etl_spark.operators.ranking import ntile_exact

    o = load_table(spark, sf_dir, "orders")
    # o_totalprice cents sum: widen past the margin-2 ceiling (~5.8e10
    # orders rows) instead of wrapping; ntile ordering and the /100.0
    # finalization are type-agnostic, so the schema is mode-invariant.
    acc_type = _orders_money_acc(spark, sf_dir, "events_rfm monet_c")
    monet = cents(F.col("o_totalprice"))
    if acc_type != "BIGINT":
        monet = monet.cast("decimal(38,0)")
    rfm = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit("2001-08-02").cast("timestamp"), F.max("o_orderdate")
        ).alias("rec_days"),
        F.count("*").alias("freq"),
        F.sum(monet).alias("monet_c"),
    )
    rfm = rfm.withColumn("_negf", -F.col("freq")).withColumn(
        "_negm", -F.col("monet_c")
    )
    rfm = ntile_exact(rfm, ["rec_days", "custkey"], 5, tile_col="r_score")
    rfm = ntile_exact(rfm, ["_negf", "custkey"], 5, tile_col="f_score")
    rfm = ntile_exact(rfm, ["_negm", "custkey"], 5, tile_col="m_score")
    return rfm.select(
        "custkey",
        "rec_days",
        "freq",
        (F.col("monet_c") / 100.0).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
    )


# --------------------------------------------------------------------------
# market-basket brand co-occurrence
# --------------------------------------------------------------------------


@spec(
    "basket_pairs",
    """
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_orders
    FROM ob a JOIN ob b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY a.p_brand, b.p_brand
    ORDER BY n_orders DESC, brand_a, brand_b
    LIMIT 50
    """,
    doc=(
        "Market-basket co-occurrence: brand pairs bought in the same "
        "order. part joins in as a broadcast (dim table); each order's "
        "distinct brand set is collected in ONE keyed agg (bounded by "
        "basket size, so collect_set state is O(items-per-order)) and "
        "the ordered pairs are generated as a nested-transform "
        "expression — no self-join, no distinct pre-shuffle, one "
        "fact-table shuffle total vs the classic a-priori self-join's "
        "two (the oracle keeps the self-join formulation as the "
        "independent derivation). TakeOrdered caps the report at 50."
    ),
)
def basket_pairs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    brands = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("bs"))
    )
    pairs = F.flatten(
        F.transform(
            F.col("bs"),
            lambda x, i: F.transform(
                F.slice(F.col("bs"), i + 2, F.size("bs") - i - 1),
                lambda y: F.struct(x.alias("brand_a"), y.alias("brand_b")),
            ),
        )
    )
    return (
        brands.select(F.explode(pairs).alias("t"))
        .select("t.brand_a", "t.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "brand_a", "brand_b")
        .limit(50)
    )


# --------------------------------------------------------------------------
# rolling active users (DAU / WAU)
# --------------------------------------------------------------------------


@spec(
    "events_active_users",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      FROM events
    ), dau AS (
      SELECT d, COUNT(*) AS dau FROM ud GROUP BY d
    ), expanded AS (
      SELECT user_id,
             CAST(UNNEST(generate_series(d, d + INTERVAL 6 DAY,
                                         INTERVAL 1 DAY)) AS DATE) AS wd
      FROM ud
    ), wau AS (
      SELECT wd AS d, COUNT(DISTINCT user_id) AS wau FROM expanded GROUP BY wd
    )
    SELECT dau.d AS day, dau.dau, wau.wau
    FROM dau JOIN wau ON dau.d = wau.d
    ORDER BY day
    """,
    doc=(
        "Daily + 7-day rolling active users (DAU/WAU). Exact rolling "
        "COUNT DISTINCT cannot slide, so each (user, day) contributes "
        "itself to the 7 windows it belongs to — a bounded x7 explode "
        "followed by keyed distinct-aggs; no window function, no "
        "unpartitioned stage, linear in active (user, day) pairs. At "
        "100 TB swap the exact distinct for HLL partials "
        "(`agg_approx_distinct`) merged per window — same explode "
        "shape, sketch-sized shuffle."
    ),
)
def events_active_users(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.to_date(F.col("ts")).alias("d")
    ).distinct()
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    expanded = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("wd"),
    )
    wau = expanded.groupBy(F.col("wd").alias("d")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, "d")
        .select(F.col("d").alias("day"), "dau", "wau")
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# weighted aggregate
# --------------------------------------------------------------------------


@spec(
    "agg_weighted",
    """
    SELECT p_brand,
           CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS total_qty,
           ROUND(SUM(CAST(FLOOR(l_extendedprice * l_quantity * 100 + 0.5) AS BIGINT))
                 * 1.0 / SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT))) / 100
             AS w_avg_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc=(
        "Quantity-weighted average price per brand — the weighted-mean "
        "aggregate pattern (sum of products over sum of weights), both "
        "accumulated as scaled BIGINTs so partial-agg order cannot "
        "perturb the quotient. Broadcast dim join + map-side-combined "
        "agg over ~25 groups."
    ),
)
def agg_weighted(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # TPC-H bounds: l_extendedprice < 1.05e5 (the derived bound behind
    # LINEITEM_CHARGE_BOUND), l_quantity <= 50 → one scaled term
    # ≤ 5.25e6·100 = 5.25e8; a single brand group can in the worst case
    # see every lineitem row, so the decision is on the table count
    # (metadata-only). Past the margin-2 ceiling the accumulators WIDEN
    # to DECIMAL(38,0) (exact either way; total_qty re-cast keeps the
    # result schema identical — see scaled_sum_acc_type).
    acc_type = scaled_sum_acc_type(
        cached_count(spark, sf_dir, "lineitem"),
        LINEITEM_PRICEQTY_BOUND,
        100,
        what="agg_weighted price*qty sum",
    )

    def acc(c):
        return c.cast("decimal(38,0)") if acc_type != "bigint" else c

    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    qty = cents(F.col("l_quantity"), 0)
    pq = cents(F.col("l_extendedprice") * F.col("l_quantity"), 2)
    return (
        j.groupBy("p_brand")
        .agg(
            F.sum(acc(qty)).cast("bigint").alias("total_qty"),
            F.sum(acc(pq)).alias("_spq"),
        )
        .select(
            "p_brand",
            "total_qty",
            (F.round(F.col("_spq") * F.lit(1.0) / F.col("total_qty")) / 100).alias(
                "w_avg_price"
            ),
        )
    )


# --------------------------------------------------------------------------
# robust (median/MAD) outlier detection
# --------------------------------------------------------------------------


@spec(
    "win_mad_outlier",
    """
    WITH med AS (
      SELECT event_type, MEDIAN(value) AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.value, m.med,
             ABS(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.event_type = m.event_type
    ), mad AS (
      SELECT event_type, MEDIAN(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(MIN(d.med) * 1000000) / 1000000 AS med,
           ROUND(MIN(m.mad) * 1000000) / 1000000 AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           COUNT(*) AS n
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    """,
    doc=(
        "Median/MAD robust outlier detection per event type (the "
        "z-score's heavy-tail-safe cousin): |x - median| > 3 * MAD. "
        "Two exact-median passes joined back as broadcasts (5 groups). "
        "Like `agg_exact_median`, exact percentiles buffer per-group "
        "values, so this spec is scoped to bounded-cardinality groups; "
        "unbounded keys route to approx_percentile (same plan shape, "
        "mergeable sketches). Both engines interpolate even-count "
        "medians identically (mean of the two middles)."
    ),
)
def win_mad_outlier(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            roundn(F.min("med"), 6).alias("med"),
            roundn(F.min("mad"), 6).alias("mad"),
            F.sum(F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# per-language character n-gram profile
# --------------------------------------------------------------------------

_PROFILE_CHARS = 200


@spec(
    "text_ngram_profile",
    f"""
    WITH c AS (
      SELECT lang, substring(lower(text), 1, {_PROFILE_CHARS}) AS t
      FROM documents
    ), g AS (
      SELECT lang, UNNEST(list_transform(
               generate_series(1, length(t) - 2), i -> substring(t, i, 3)))
               AS gram
      FROM c
    ), counts AS (
      SELECT lang, gram, COUNT(*) AS n FROM g GROUP BY lang, gram
    ), ranked AS (
      SELECT lang, gram, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, gram ASC) AS rk
      FROM counts
    )
    SELECT lang, gram, n, rk FROM ranked WHERE rk <= 5
    """,
    doc=(
        "Per-language character-trigram frequency profile (top 5 per "
        "language) — the training side of n-gram language ID "
        "(`text_langid` is the scoring side). Truncating to the first "
        f"{_PROFILE_CHARS} chars bounds the explode fanout per doc; the "
        "top-k per group is a partitioned window (keyed by lang), never "
        "a global sort."
    ),
)
def text_ngram_profile(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    t = F.substring(F.lower(F.col("text")), 1, _PROFILE_CHARS)
    c = spread(d).select("lang", t.alias("t")).where(F.length("t") >= 3)
    grams = F.transform(
        F.sequence(F.lit(1), F.length("t") - 2),
        lambda i: F.col("t").substr(i, F.lit(3)),
    )
    counts = (
        c.select("lang", F.explode(grams).alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("gram").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("lang", "gram", "n", "rk")
    )


# --------------------------------------------------------------------------
# grouping sets with grouping_id
# --------------------------------------------------------------------------

def _gid_sql(acc: str = "BIGINT") -> str:
    return f"""
    SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                ELSE o_orderpriority END AS priority,
           CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                ELSE o_orderstatus END AS status,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                AS BIGINT) AS gid,
           COUNT(*) AS n,
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS {acc})) / 1e2 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
"""


_GID_SQL = _gid_sql()


@spec(
    "agg_grouping_id",
    _GID_SQL,
    doc=(
        "Grouping sets with explicit GROUPING() disambiguation: rollup "
        "NULLs are relabeled 'ALL' and a grouping-id column identifies "
        "the set each row came from — the cube-metadata pattern BI "
        "layers depend on (a real NULL key must remain distinguishable "
        "from a rollup row). Spark expands the sets map-side into one "
        "shuffle; money sums are scaled BIGINT."
    ),
)
def agg_grouping_id(spark, sf_dir):
    acc = _orders_money_acc(spark, sf_dir, "agg_grouping_id total")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gid_orders")
    return spark.sql(_gid_sql(acc).replace("FROM orders", "FROM _gid_orders"))


# --------------------------------------------------------------------------
# per-document token entropy
# --------------------------------------------------------------------------


@spec(
    "text_entropy",
    f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({_TOKS_SQL}) AS term FROM documents
    ), tc AS (
      SELECT doc_id, term, COUNT(*) AS c FROM toks GROUP BY doc_id, term
    ), tn AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM tc GROUP BY doc_id
    )
    SELECT tc.doc_id,
           MIN(tn.n) AS n_tokens,
           ROUND(SUM(CAST(ROUND(-(tc.c * 1.0 / tn.n) * ln(tc.c * 1.0 / tn.n)
                                * 1000000) AS BIGINT)) * 1.0
                 / 1000000 * 10000) / 10000 AS entropy
    FROM tc JOIN tn ON tc.doc_id = tn.doc_id
    GROUP BY tc.doc_id
    """,
    doc=(
        "Shannon entropy of each document's unigram distribution — low "
        "entropy flags repetitive/templated text (a core pre-training "
        "quality signal alongside `text_repetition`). Per-term "
        "-p*ln(p) values are quantized to 1e-6 BIGINTs before the "
        "cross-row sum, so accumulation order (and the engines' 1-ulp "
        "ln() differences) cannot move the hash. Two keyed aggs on "
        "doc_id — co-partitioned, no extra shuffle for the join."
    ),
)
def text_entropy(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # Per-doc sum of -p·ln(p)·1e6 terms (each ≤ 1e6/e); 1e8 tokens per
    # document is an absurd upper bound and still leaves 4 orders of
    # magnitude of int64 headroom — a static shape check, no job.
    assert_scaled_sum_headroom(
        10**8, 0.37, 10**6, what="text_entropy per-doc -p·ln(p) sum"
    )
    from odl_etl_spark.operators.materialize import materialize

    # (doc, term, c) feeds both the per-doc total agg and the entropy
    # join; materialize it so the corpus tokenizes ONCE per run instead
    # of once per reference (r17, the text_bm25-family restructure).
    tc = materialize(
        spread(d)
        .select("doc_id", F.explode(T.tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("c"))
    )
    tn = tc.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c") * F.lit(1.0) / F.col("n")
    term_q = F.round(-p * F.log(p) * F.lit(1000000.0)).cast("bigint")
    return (
        tc.join(tn, "doc_id")
        .select("doc_id", F.col("n"), term_q.alias("tq"))
        .groupBy("doc_id")
        .agg(
            F.min("n").alias("n_tokens"),
            roundn(F.sum("tq") * F.lit(1.0) / F.lit(1000000.0), 4).alias("entropy"),
        )
    )


# --------------------------------------------------------------------------
# funnel conversion timing
# --------------------------------------------------------------------------


@spec(
    "events_funnel_time",
    """
    WITH v AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS tv
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS tp
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > v.tv
      GROUP BY e.user_id
    ), d AS (
      SELECT v.user_id,
             epoch_us(p.tp) - epoch_us(v.tv) AS dus
      FROM v LEFT JOIN p ON v.user_id = p.user_id
    )
    SELECT COUNT(*) AS n_viewed,
           CAST(COUNT(dus) AS BIGINT) AS n_converted,
           ROUND((COUNT(dus) * 1.0 / COUNT(*)) * 10000) / 10000 AS conv_rate,
           ROUND(SUM(dus) * 1.0 / COUNT(dus) / 3600000000 * 10000) / 10000
             AS avg_hours,
           ROUND(MEDIAN(dus) / 3600000000 * 10000) / 10000 AS p50_hours
    FROM d
    """,
    doc=(
        "View -> purchase conversion timing: first view per user, first "
        "purchase strictly after it, deltas aggregated to conversion "
        "rate / mean / median hours. Deltas are integer microseconds "
        "(epoch_us both engines; Spark's loader already truncated the "
        "ns timestamps to µs), so every aggregate is integer-exact; "
        "the median interpolates two BIGINTs identically. Two keyed "
        "aggs + one keyed join, then a single global fold."
    ),
)
def events_funnel_time(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    d = v.join(p, "user_id", "left").select(
        (F.unix_micros("tp") - F.unix_micros("tv")).alias("dus")
    )
    hours = F.lit(3600000000.0)
    return d.agg(
        F.count("*").alias("n_viewed"),
        F.count("dus").cast("bigint").alias("n_converted"),
        roundn(F.count("dus") * F.lit(1.0) / F.count("*"), 4).alias("conv_rate"),
        roundn(F.sum("dus") * F.lit(1.0) / F.count("dus") / hours, 4).alias(
            "avg_hours"
        ),
        roundn(F.expr("percentile(dus, 0.5)") / hours, 4).alias("p50_hours"),
    )


# --------------------------------------------------------------------------
# product-quantization codebook
# --------------------------------------------------------------------------

_PQ_SUBS = 8  # 64 dims -> 8 subspaces of 8
_PQ_CODES = 16


@spec(
    "emb_pq_codebook",
    f"""
    WITH ex AS (
      SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ), exs AS (
      SELECT vec_id, x, i, (i - 1) // 8 AS sub,
             vec_id % {_PQ_CODES} AS init_code
      FROM ex
    ), cent AS (
      SELECT init_code AS code, i, sub,
             SUM(CAST(ROUND(x * 1000000000) AS BIGINT)) AS sx,
             COUNT(*) AS n
      FROM exs GROUP BY init_code, i, sub
    ), dist AS (
      SELECT e.vec_id, e.sub, c.code,
             SUM(CAST(ROUND((e.x - c.sx / 1000000000.0 / c.n)
                            * (e.x - c.sx / 1000000000.0 / c.n)
                            * 1000000000) AS BIGINT)) AS d2q
      FROM exs e JOIN cent c ON e.i = c.i
      GROUP BY e.vec_id, e.sub, c.code
    ), asg AS (
      SELECT vec_id, sub, code, d2q,
             ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                ORDER BY d2q ASC, code ASC) AS rn
      FROM dist
    )
    SELECT sub, code, COUNT(*) AS n_vecs,
           ROUND(SUM(d2q) * 1.0 / COUNT(*) / 1000000000 * 1000000) / 1000000
             AS avg_d2
    FROM asg WHERE rn = 1
    GROUP BY sub, code
    """,
    doc=(
        "Product-quantization codebook assignment (Jegou et al. 2011): "
        f"64-dim vectors split into {_PQ_SUBS} subspaces of 8 dims; "
        f"each subspace gets {_PQ_CODES} centroids (deterministic "
        "vec_id%k seeding, same posture as `emb_kmeans` init) and every "
        "vector is assigned its argmin code per subspace — the 8-byte "
        "compressed representation ANN memory budgets depend on. "
        "Centroids are parameter data (128 x 8 values) joined as a "
        "broadcast; squared-distance terms quantize to BIGINT before "
        "every cross-row sum; argmin is a (vec, sub)-keyed window with "
        "code tie-break, never a global sort."
    ),
)
def emb_pq_codebook(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = spread(e).select(
        "vec_id",
        F.posexplode("v").alias("i0", "x"),
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        "x",
        F.floor(F.col("i0") / 8).alias("sub"),
        (F.col("vec_id") % _PQ_CODES).alias("init_code"),
    )
    cent = ex.groupBy(
        F.col("init_code").alias("code"), "i", "sub"
    ).agg(
        F.sum(F.round(F.col("x") * F.lit(1000000000.0)).cast("bigint")).alias("sx"),
        F.count("*").alias("n"),
    )
    cx = F.col("sx") / F.lit(1000000000.0) / F.col("n")
    cent = cent.select("code", F.col("i").alias("ci"), cx.alias("cx"))
    dist = (
        ex.join(F.broadcast(cent), ex.i == cent.ci)
        .select(
            "vec_id",
            "sub",
            "code",
            F.round((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx")) * F.lit(1000000000.0))
            .cast("bigint")
            .alias("dq"),
        )
        .groupBy("vec_id", "sub", "code")
        .agg(F.sum("dq").alias("d2q"))
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.col("d2q").asc(), F.col("code").asc()
    )
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("sub", "code")
        .agg(
            F.count("*").alias("n_vecs"),
            roundn(
                F.sum("d2q") * F.lit(1.0) / F.count("*") / F.lit(1000000000.0), 6
            ).alias("avg_d2"),
        )
    )


# --------------------------------------------------------------------------
# corpus-level IDF / stopword discovery
# --------------------------------------------------------------------------


@spec(
    "text_idf_stop",
    f"""
    WITH dt AS (
      SELECT doc_id, UNNEST(list_distinct({_TOKS_SQL})) AS term
      FROM documents
    ), df AS (
      SELECT term, COUNT(*) AS df FROM dt GROUP BY term
    ), nd AS (SELECT COUNT(*) AS n FROM documents)
    SELECT term, df,
           ROUND(ln(nd.n * 1.0 / df) * 1000000) / 1000000 AS idf
    FROM df, nd
    ORDER BY df DESC, term ASC
    LIMIT 30
    """,
    doc=(
        "Corpus-level document frequency + IDF, highest-DF first — the "
        "data-driven stopword list builder (tokens appearing in almost "
        "every document carry no retrieval signal; this list feeds "
        "`text_bm25`'s and `dedup_ngram_jaccard`'s stop-term bounds). "
        "Doc-level distinct happens inside the array (list_distinct "
        "before the explode), the corpus count joins in as a 1-row "
        "broadcast, and TakeOrdered caps the report."
    ),
)
def text_idf_stop(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.groupBy().agg(F.count("*").alias("n"))
    df = (
        spread(d)
        .select("doc_id", F.explode(F.array_distinct(T.tokens("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    return (
        df.crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            roundn(F.log(F.col("n") * F.lit(1.0) / F.col("df")), 6).alias("idf"),
        )
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(30)
    )


# --------------------------------------------------------------------------
# order backlog (global running totals)
# --------------------------------------------------------------------------


@spec(
    "orders_backlog",
    """
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS val_c
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    )
    SELECT day, n_orders,
           CAST(SUM(n_orders) OVER (ORDER BY day) AS BIGINT) AS cum_orders,
           SUM(val_c) OVER (ORDER BY day) / 100.0 AS cum_value
    FROM d ORDER BY day
    """,
    doc=(
        "Daily order intake with exact global running totals — the "
        "backlog/burn-down report. The raw fact table first collapses "
        "to one row per calendar day (a keyed agg; the domain is "
        "calendar-bounded, ~2.4k rows for the fixture's 6.5 years, "
        "~36.5k for a century), THEN the running sum applies. For "
        "unbounded sort domains the same query routes through "
        "operators/ranking.py's global_cumsum (range shuffle + offset "
        "table); here the post-agg input is small by construction and "
        "the distributed prefix sum is used anyway to keep the plan "
        "scale-shaped. Money is scaled-BIGINT cents."
    ),
)
def orders_backlog(spark, sf_dir):
    from odl_etl_spark.operators.ranking import global_cumsum

    o = load_table(spark, sf_dir, "orders")
    # Widen the per-day cents sum past the margin-2 orders ceiling; the
    # running total then accumulates decimals exactly too, and cum_value
    # divides to the same double either way.
    acc_type = _orders_money_acc(spark, sf_dir, "orders_backlog val_c")
    val = cents(F.col("o_totalprice"))
    if acc_type != "BIGINT":
        val = val.cast("decimal(38,0)")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n_orders"),
        F.sum(val).alias("val_c"),
    )
    # Both running totals share ONE total order (day), so one
    # global_cumsum call computes them over a single range shuffle +
    # offset broadcast instead of two full two-level passes.
    d = global_cumsum(d, ["day"], ["n_orders", "val_c"], cum_col=["_co", "_cv"])
    return d.select(
        "day",
        "n_orders",
        (F.col("_co") + F.col("n_orders")).cast("bigint").alias("cum_orders"),
        ((F.col("_cv") + F.col("val_c")) / 100.0).alias("cum_value"),
    ).orderBy("day")


def _q10_sql(acc: str = "BIGINT") -> str:
    return f"""
    SELECT c_custkey, c_name,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS {acc}))
             / 1e4 AS revenue,
           FLOOR(c_acctbal * 100 + 0.5) / 100 AS acctbal,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


_Q10_SQL = _q10_sql()


@spec(
    "sql_tpch_q10",
    _Q10_SQL,
    doc=(
        "TPC-H Q10 returned-item reporting (adapted to the fixture "
        "columns): quarter-scoped fact filters pushed to both scans, "
        "nation broadcast, customer join keyed on the agg output - the "
        "classic report-over-star shape. Passthrough text identical on "
        "both engines; money in scaled BIGINT."
    ),
)
def sql_tpch_q10(spark, sf_dir):
    acc = _lineitem_money_acc(spark, sf_dir, "sql_tpch_q10 revenue")
    register_views(spark, sf_dir)
    return spark.sql(_q10_sql(acc))


_RECURSIVE_SQL = """
    WITH RECURSIVE anc AS (
      SELECT p_partkey AS part, CAST(p_partkey % 4096 AS BIGINT) AS node,
             0 AS depth
      FROM part
      UNION ALL
      SELECT a.part, CAST(FLOOR(a.node / 2) AS BIGINT) AS node,
             a.depth + 1 AS depth
      FROM anc a WHERE a.node > 0
    )
    SELECT a.part, MAX(a.depth) AS depth, COUNT(*) AS chain_len,
           SUM(CAST(FLOOR(p.p_retailprice * 100 + 0.5) AS BIGINT)) / 1e2
             AS chain_price
    FROM anc a JOIN part p ON p.p_partkey = a.node
    GROUP BY a.part
"""


@spec(
    "sql_recursive_cte",
    _RECURSIVE_SQL,
    doc=(
        "Recursive CTE (WITH RECURSIVE, Spark 4 / DuckDB — identical "
        "text): ancestor-chain walk over a synthetic part hierarchy "
        "(anchor node = partkey mod 4096, parent(k) = floor(k/2) — a "
        "binary tree rooted at 0), rolling each part's ancestor chain "
        "up into depth / length / chain-price — the BOM-explosion / "
        "org-chart shape. The SQL-surface complement to the DataFrame-"
        "loop iterative operators (pagerank, connected components): "
        "Spark executes it as iterated union steps, one level per job. "
        "The mod-4096 anchor is the scale contract: iteration count = "
        "tree DEPTH, and the sf1 probe showed an id-derived unbounded "
        "tree (depth ~ log maxkey) amplifying Spark's per-level "
        "iteration cost superlinearly at 10x data — a real hierarchy "
        "has scale-invariant depth, so the synthetic one must too "
        "(SCALING.md). FLOOR before the BIGINT cast matters: Spark "
        "CAST(double AS BIGINT) truncates while DuckDB rounds."
    ),
)
def sql_recursive_cte(spark, sf_dir):
    # Spark guards recursive CTEs with a CUMULATIVE row cap
    # (spark.sql.cteRecursionRowLimit, default 1e6) and errors — not
    # degrades — past it. Chain volume is anchor_rows x depth(<=13 by
    # the mod-4096 contract); size the cap from the metadata-only part
    # count so the query scales instead of tripping the default at
    # ~80k anchors (the sf1 probe found exactly this).
    #
    # The cap is read at EXECUTION time, so a set/restore around the
    # build would re-trip the default when the caller later collects;
    # and setting it on the caller's session leaks a loosened guard
    # into every subsequent query (ADVICE r5). Scope it to a forked
    # session instead: newSession() shares the SparkContext/executors
    # but owns its SQLConf and temp views, so the returned DataFrame
    # carries the override and the caller's session stays pristine.
    from odl_etl_spark.session import tune_session

    n_parts = cached_count(spark, sf_dir, "part")
    sub = tune_session(spark.newSession())
    sub.conf.set(
        "spark.sql.cteRecursionRowLimit", str(max(1_000_000, n_parts * 16))
    )
    register_views(sub, sf_dir)
    return sub.sql(_RECURSIVE_SQL)


SPECS = [
    sql_tpch_q1,
    sql_tpch_q5,
    sql_tpch_q18,
    quality_gopher,
    corpus_filter_c4,
    text_ngram_containment,
    emb_norm_stats,
    join_interval_overlap,
    events_rfm,
    basket_pairs,
    events_active_users,
    agg_weighted,
    win_mad_outlier,
    text_ngram_profile,
    agg_grouping_id,
    text_entropy,
    events_funnel_time,
    emb_pq_codebook,
    text_idf_stop,
    orders_backlog,
    sql_tpch_q10,
    sql_recursive_cte,
]
