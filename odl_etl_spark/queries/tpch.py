"""TPC-H completion: the 17 report shapes not yet in the registry.

With q1/q3/q5/q10/q18 already present (``queries/extras.py``,
``queries/scans.py``), this module completes all 22 TPC-H query
signatures. The fixture schema is a reduced TPC-H (TESTDATA.md): no
``partsupp`` table and no shipmode/commitdate/receiptdate/phone/comment
columns — so queries that touch those are *adapted to the fixture
columns* (the posture ``sql_tpch_q10`` established), keeping each
query's structural signature intact:

  * q2   correlated MIN subquery bound through a relationship table
         (lineitem stands in for partsupp as the supply relationship);
  * q4   correlated EXISTS with an interval predicate;
  * q11  group-HAVING against an uncorrelated global-scalar subquery;
  * q16  NOT IN (null-aware anti join) + COUNT(DISTINCT);
  * q17  correlated scalar AVG subquery per part;
  * q19  disjunction-of-conjunctions join predicate (pushdown test);
  * q20  nested semi-join chain (IN over a grouped HAVING over a semi);
  * q21  correlated EXISTS + NOT EXISTS with a non-equality predicate;
  * q22  anti join + global-average scalar subquery + prefix grouping.

Every spec is ANSI passthrough — the IDENTICAL text runs on Spark and
DuckDB — with cross-row money accumulation in scaled BIGINT (the
``extras.py`` determinism posture; float addition is not associative and
the two engines sum in different orders). Single-group global sums call
``assert_scaled_sum_headroom`` so a 100 TB run refuses loudly instead of
wrapping int64 silently.

Portability note: fractional literals are written in scientific notation
(``1e0``, ``1e2``, ``1e-3``) because Spark parses ``1.0`` as a DECIMAL
literal (propagating DECIMAL through the expression and changing the
result type) while DuckDB parses it as DOUBLE; ``1eN`` is DOUBLE in
both.

Derivation: generalizes the reference's report/export surface
(mitodl/odl-etl mitx_etl.py:195-203 course exports feeding BI reports)
to the canonical decision-support suite, per SURVEY.md §2B/§8.
"""

from __future__ import annotations

from odl_etl_spark.functions.numeric import (
    CUSTOMER_ACCTBAL_BOUND,
    LINEITEM_CHARGE_BOUND,
    scaled_sum_acc_type,
    sql_cents,
)
from odl_etl_spark.io.sources import cached_count, load_table, register_views
from odl_etl_spark.queries.base import spec

# Reused scaled-money fragment (identical text on both engines), on the
# house floor-cents quantizer (functions/numeric.sql_cents). Round-13
# migration of the r12 deferral: the previous ROUND(double) form routes
# every row through BigDecimal on the Spark side (exits whole-stage
# codegen's primitive lane, measured ~2x on money-heavy aggs —
# SCALING.md round-12); floor(x*scale + 0.5) is the vectorized path and
# the IDENTICAL IEEE expression on both engines, so the oracle tie is
# unchanged. Values are unchanged off .5 boundaries; every column this
# fragment scales is on a decimal grid whose scaled form never lands
# near .5 (round-12 exposure audit).
def _rev_c(acc: str = "BIGINT") -> str:
    return sql_cents("l_extendedprice * (1 - l_discount)", 4, acc)


_REV_C = _rev_c()


def _money_acc(
    spark,
    sf_dir,
    what: str,
    scale: int = 10**4,
    table: str = "lineitem",
    bound: float = LINEITEM_CHARGE_BOUND,
) -> str:
    """Accumulator type for this query's scaled money SUMs: 'BIGINT'
    while the all-rows-in-one-group worst case (``bound``·``scale`` per
    row × the table count) provably fits int64, 'DECIMAL(38,0)' past it
    (functions/numeric.scaled_sum_acc_type — margin 2 on a HARD bound,
    the measured ×5 decimal tax deferred to the last exact row). This
    replaced the round-12 refusal guard: at lake scale the money keys
    now RUN on the widened exact accumulator instead of raising.
    ``LINEITEM_CHARGE_BOUND`` dominates every smaller lineitem money
    term these queries scale. Quantity-only sums (q18/q20 HAVING,
    bound 50/row, margin-2 ceiling ~9e16 rows) stay BIGINT by
    arithmetic and are not routed through this.

    The row count comes from the process-lifetime ``cached_count`` —
    one count() job per (sf_dir, table), not one per guarded query
    build (VERDICT r5 #5)."""
    return scaled_sum_acc_type(
        cached_count(spark, sf_dir, table), bound, scale, what=what
    ).upper()


_Q2_SQL = f"""
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part, supplier, lineitem, nation, region
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND p_type = 'LARGE' AND p_size <= 10
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND l_extendedprice / l_quantity = (
            SELECT MIN(l2.l_extendedprice / l2.l_quantity)
            FROM lineitem l2, supplier s2, nation n2, region r2
            WHERE l2.l_partkey = p_partkey
              AND s2.s_suppkey = l2.l_suppkey
              AND s2.s_nationkey = n2.n_nationkey
              AND n2.n_regionkey = r2.r_regionkey
              AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""


@spec(
    "sql_tpch_q2",
    _Q2_SQL,
    doc=(
        "TPC-H Q2 minimum-cost supplier (adapted: lineitem is the "
        "part-supplier relationship since the fixture has no partsupp; "
        "unit price l_extendedprice/l_quantity stands in for "
        "ps_supplycost). The signature survives: a correlated MIN "
        "scalar subquery re-joining the relationship through the "
        "region dim. Catalyst decorrelates it to an aggregate keyed on "
        "partkey joined back to the outer star; dims broadcast. "
        "Per-row IEEE division is engine-identical so the MIN-equality "
        "match is exact."
    ),
)
def sql_tpch_q2(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(_Q2_SQL)


_Q4_SQL = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
            SELECT * FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@spec(
    "sql_tpch_q4",
    _Q4_SQL,
    doc=(
        "TPC-H Q4 order-priority checking (adapted: the fixture has no "
        "commitdate/receiptdate, so 'late' = any line shipped more than "
        "60 days after the order date — same correlated-EXISTS-with-"
        "interval-predicate signature). Spark plans a LeftSemi join on "
        "orderkey with the quarter filter pushed to the orders scan; "
        "the priority agg is 5 groups with map-side combine."
    ),
)
def sql_tpch_q4(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(_Q4_SQL)


def _q6_sql(acc: str = "BIGINT") -> str:
    return f"""
    SELECT SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000 + 0.5) AS {acc}))
             / 1e4 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


_Q6_SQL = _q6_sql()


@spec(
    "sql_tpch_q6",
    _Q6_SQL,
    doc=(
        "TPC-H Q6 forecasting revenue change: the purest pushdown test "
        "— a single scan with three range predicates and one global "
        "sum, no join, no per-group shuffle. All three predicates reach "
        "the parquet scan (PushedFilters), and the aggregate is a "
        "partial/final pair exchanging one row per task. Money in "
        "scaled BIGINT with an overflow guard sized to the table."
    ),
)
def sql_tpch_q6(spark, sf_dir):
    acc = _money_acc(spark, sf_dir, "sql_tpch_q6 revenue")
    register_views(spark, sf_dir)
    return spark.sql(_q6_sql(acc))


def _q7_sql(acc: str = "BIGINT") -> str:
    return f"""
    SELECT supp_nation, cust_nation, l_year, SUM(volume_c) / 1e4 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
             {_rev_c(acc)} AS volume_c
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey
        AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


_Q7_SQL = _q7_sql()


@spec(
    "sql_tpch_q7",
    _Q7_SQL,
    doc=(
        "TPC-H Q7 volume shipping: two nation-dim joins with a "
        "symmetric OR pair predicate. Both nation joins broadcast; the "
        "OR filter applies after the broadcast join (it references both "
        "sides) while the shipdate window pushes to the lineitem scan. "
        "The fact-side work is orders x lineitem on orderkey + customer "
        "on custkey — the only shuffles."
    ),
)
def sql_tpch_q7(spark, sf_dir):
    acc = _money_acc(spark, sf_dir, "sql_tpch_q7 revenue")
    register_views(spark, sf_dir)
    return spark.sql(_q7_sql(acc))


def _q8_sql(acc: str = "BIGINT") -> str:
    return f"""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume_c ELSE 0 END)
                 * 1e0 / SUM(volume_c) * 10000) / 10000 AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             {_rev_c(acc)} AS volume_c,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1,
           nation n2, region
      WHERE p_partkey = l_partkey
        AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA'
        AND s_nationkey = n2.n_nationkey
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""


_Q8_SQL = _q8_sql()


@spec(
    "sql_tpch_q8",
    _Q8_SQL,
    doc=(
        "TPC-H Q8 national market share: the 8-way star with a "
        "conditional-aggregate ratio. Every dim (part, supplier, "
        "customer, nation x2, region) broadcasts; the two fact shuffles "
        "are lineitem x orders on orderkey and the 2-group year agg. "
        "The share divides two scaled-BIGINT sums of the same group, so "
        "the ratio is exact before the final portable rounding."
    ),
)
def sql_tpch_q8(spark, sf_dir):
    acc = _money_acc(spark, sf_dir, "sql_tpch_q8 volume")
    register_views(spark, sf_dir)
    return spark.sql(_q8_sql(acc))


def _q9_sql(acc: str = "BIGINT") -> str:
    return f"""
    SELECT nation, o_year, SUM(amount_c) / 1e4 AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             CAST(FLOOR((l_extendedprice * (1 - l_discount)
                         - 0.1 * p_retailprice * l_quantity) * 10000 + 0.5)
                  AS {acc}) AS amount_c
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey
        AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey
        AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""


_Q9_SQL = _q9_sql()


@spec(
    "sql_tpch_q9",
    _Q9_SQL,
    doc=(
        "TPC-H Q9 product-type profit (adapted: no partsupp, so cost = "
        "10% of p_retailprice per unit instead of ps_supplycost — the "
        "join structure and the LIKE-on-part-name filter survive). "
        "part/supplier/nation broadcast with the name filter pushed to "
        "the part scan; lineitem x orders on orderkey is the one big "
        "shuffle; profit accumulates as scaled BIGINT per (nation, "
        "year)."
    ),
)
def sql_tpch_q9(spark, sf_dir):
    acc = _money_acc(spark, sf_dir, "sql_tpch_q9 amount")
    register_views(spark, sf_dir)
    return spark.sql(_q9_sql(acc))


_Q11_NATIONS = "('NATION_5', 'NATION_6', 'NATION_7')"

def _q11_sql(acc: str = "BIGINT") -> str:
    return f"""
    SELECT l_partkey AS ps_partkey, SUM({_rev_c(acc)}) / 1e4 AS value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_name IN {_Q11_NATIONS}
    GROUP BY l_partkey
    HAVING SUM({_rev_c(acc)}) > (
        SELECT SUM({_rev_c(acc)}) * 1e-3
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_name IN {_Q11_NATIONS})
    ORDER BY value DESC, ps_partkey
"""


_Q11_SQL = _q11_sql()


@spec(
    "sql_tpch_q11",
    _Q11_SQL,
    doc=(
        "TPC-H Q11 important stock (adapted: lineitem supply value "
        "stands in for partsupp availqty x supplycost). The signature "
        "is the HAVING-above-global-scalar: an uncorrelated scalar "
        "subquery over the same filtered join feeds every group's "
        "comparison as a broadcast 1-row value. Both the group sum and "
        "the global threshold accumulate the same scaled BIGINTs, so "
        "the > comparison is exact cross-engine."
    ),
)
def sql_tpch_q11(spark, sf_dir):
    acc = _money_acc(spark, sf_dir, "sql_tpch_q11 value")
    register_views(spark, sf_dir)
    return spark.sql(_q11_sql(acc))


_Q12_SQL = """
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@spec(
    "sql_tpch_q12",
    _Q12_SQL,
    doc=(
        "TPC-H Q12 shipping-priority distribution (adapted: the fixture "
        "has no l_shipmode, so lines class by l_returnflag — the "
        "conditional-count-pivot signature over a fact join survives "
        "unchanged). One orderkey shuffle join with the year window "
        "pushed to the lineitem scan; the CASE pivot folds into the "
        "partial aggregate, so only 3 groups x 2 counters exchange."
    ),
)
def sql_tpch_q12(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(_Q12_SQL)


_Q13_SQL = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@spec(
    "sql_tpch_q13",
    _Q13_SQL,
    doc=(
        "TPC-H Q13 customer order-count distribution (adapted: the "
        "NOT-LIKE-comment exclusion becomes a priority exclusion; the "
        "signature — LEFT JOIN with an ON-side filter so zero-order "
        "customers survive with count 0, then a histogram-of-counts "
        "re-aggregation — is unchanged). Two shuffles: custkey join + "
        "count, then the tiny distribution agg."
    ),
)
def sql_tpch_q13(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(_Q13_SQL)


def _q14_sql(acc: str = "BIGINT") -> str:
    return f"""
    SELECT ROUND(1e2
                 * SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END)
                 / SUM(rev_c) * 10000) / 10000 AS promo_revenue
    FROM (
      SELECT p_type, {_rev_c(acc)} AS rev_c
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1997-09-01'
        AND l_shipdate < TIMESTAMP '1997-10-01'
    ) priced
"""


_Q14_SQL = _q14_sql()


@spec(
    "sql_tpch_q14",
    _Q14_SQL,
    doc=(
        "TPC-H Q14 promotion effect: conditional-over-total revenue "
        "ratio for one month. part broadcasts into the filtered "
        "lineitem scan (month window pushed down); both sums are "
        "scaled-BIGINT of the same rows so the percentage is exact "
        "before the final portable rounding. Global single-group sum "
        "=> overflow guard."
    ),
)
def sql_tpch_q14(spark, sf_dir):
    acc = _money_acc(spark, sf_dir, "sql_tpch_q14 revenue")
    register_views(spark, sf_dir)
    return spark.sql(_q14_sql(acc))


def _q15_sql(acc: str = "BIGINT") -> str:
    return f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_rev_c(acc)}) AS total_revenue_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue_c / 1e4 AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue_c = (SELECT MAX(total_revenue_c) FROM revenue)
    ORDER BY s_suppkey
"""


_Q15_SQL = _q15_sql()


@spec(
    "sql_tpch_q15",
    _Q15_SQL,
    doc=(
        "TPC-H Q15 top supplier: the view-reused-twice shape (CTE "
        "feeding both the probe side and a MAX scalar subquery). "
        "Catalyst evaluates the scalar subquery once as a broadcast "
        "1-row value and semi-filters the per-supplier aggregate; the "
        "MAX equality is over integer-exact scaled revenue, so ties "
        "and the argmax are deterministic cross-engine."
    ),
)
def sql_tpch_q15(spark, sf_dir):
    acc = _money_acc(spark, sf_dir, "sql_tpch_q15 total_revenue")
    register_views(spark, sf_dir)
    return spark.sql(_q15_sql(acc))


_Q16_SQL = """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
"""


@spec(
    "sql_tpch_q16",
    _Q16_SQL,
    doc=(
        "TPC-H Q16 parts/supplier relationship (adapted: lineitem is "
        "the part-supplier relationship; the complaint exclusion "
        "becomes a negative-balance exclusion since s_comment is not "
        "in the fixture). The signature survives: NOT IN compiles to a "
        "null-aware broadcast anti join, the part filters push to the "
        "scan, and COUNT(DISTINCT) plans the two-phase distinct "
        "aggregate."
    ),
)
def sql_tpch_q16(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(_Q16_SQL)


def _q17_sql(acc: str = "BIGINT") -> str:
    return f"""
    SELECT SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS {acc})) / 1e2 / 7.0
             AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#3'
      AND l_quantity < (
            SELECT 0.2 * AVG(l2.l_quantity)
            FROM lineitem l2
            WHERE l2.l_partkey = p_partkey)
"""


_Q17_SQL = _q17_sql()


@spec(
    "sql_tpch_q17",
    _Q17_SQL,
    doc=(
        "TPC-H Q17 small-quantity-order revenue: the correlated scalar "
        "AVG subquery per part. Catalyst decorrelates to a partkey-"
        "keyed average joined back to the brand-filtered fact rows. "
        "Quantities are integer-valued doubles, so the per-part AVG is "
        "exact (integer sum / count) and the 0.2x threshold compare is "
        "engine-identical; the revenue sum is scaled-BIGINT cents."
    ),
)
def sql_tpch_q17(spark, sf_dir):
    acc = _money_acc(spark, sf_dir, "sql_tpch_q17 revenue", scale=10**2)
    register_views(spark, sf_dir)
    return spark.sql(_q17_sql(acc))


def _q19_sql(acc: str = "BIGINT") -> str:
    return f"""
    SELECT SUM({_rev_c(acc)}) / 1e4 AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
            AND l_quantity >= 1 AND l_quantity <= 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
            AND l_quantity >= 10 AND l_quantity <= 20)
        OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
            AND l_quantity >= 20 AND l_quantity <= 30))
"""


_Q19_SQL = _q19_sql()


@spec(
    "sql_tpch_q19",
    _Q19_SQL,
    doc=(
        "TPC-H Q19 discounted revenue (adapted: container/shipmode "
        "clauses become size/quantity windows — the signature is the "
        "disjunction-of-conjunctions join predicate). Catalyst factors "
        "the common p_partkey equi-key out of the OR so the join stays "
        "hash-based (broadcast part), derives single-side OR filters "
        "for both scans, and evaluates the residual disjunction post-"
        "join. The revenue sum is one global scaled-BIGINT group."
    ),
)
def sql_tpch_q19(spark, sf_dir):
    acc = _money_acc(spark, sf_dir, "sql_tpch_q19 revenue")
    register_views(spark, sf_dir)
    return spark.sql(_q19_sql(acc))


_Q20_SQL = """
    SELECT s_name, FLOOR(s_acctbal * 100 + 0.5) / 100 AS s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem, part
            WHERE l_partkey = p_partkey
              AND p_name LIKE 'red%'
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey
            HAVING SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) > 400)
      AND s_nationkey = n_nationkey
      AND n_name IN ('NATION_2', 'NATION_4', 'NATION_6', 'NATION_8')
    ORDER BY s_name
"""


@spec(
    "sql_tpch_q20",
    _Q20_SQL,
    doc=(
        "TPC-H Q20 potential part promotion (adapted: availqty > half "
        "of shipped quantity becomes shipped quantity > threshold, "
        "since there is no partsupp). The nested-semi signature "
        "survives: IN over a grouped HAVING whose input is itself a "
        "part semi-join (name-prefix filter pushed to the part scan). "
        "Spark plans LeftSemi(orderly aggregated lineitem) into the "
        "broadcast nation-filtered supplier dim."
    ),
)
def sql_tpch_q20(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(_Q20_SQL)


_Q21_SQL = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
            SELECT * FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT * FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_6'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""


@spec(
    "sql_tpch_q21",
    _Q21_SQL,
    doc=(
        "TPC-H Q21 suppliers who kept orders waiting (adapted: 'late' "
        "= returnflag R since receipt/commit dates are not in the "
        "fixture). The signature — correlated EXISTS plus correlated "
        "NOT EXISTS, each with a non-equality suppkey predicate — "
        "survives: Spark decorrelates to a LeftSemi and a LeftAnti "
        "join on orderkey with the <>-predicate as a join condition, "
        "over the same finished-order fact rows."
    ),
)
def sql_tpch_q21(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(_Q21_SQL)


def _q22_sql(acc: str = "BIGINT") -> str:
    return f"""
    SELECT cntrycode, COUNT(*) AS numcust,
           SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS {acc})) / 1e2 AS totacctbal
    FROM (
      SELECT SUBSTR(c_name, 15, 2) AS cntrycode, c_acctbal
      FROM customer
      WHERE SUBSTR(c_name, 15, 2)
              IN ('00', '02', '04', '06', '08', '10', '12')
        AND c_acctbal > (
              SELECT SUM(CAST(FLOOR(c2.c_acctbal * 100 + 0.5) AS {acc})) * 1e0
                     / COUNT(*) / 100
              FROM customer c2
              WHERE c2.c_acctbal > 0)
        AND NOT EXISTS (
              SELECT * FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
"""


_Q22_SQL = _q22_sql()


@spec(
    "sql_tpch_q22",
    _Q22_SQL,
    doc=(
        "TPC-H Q22 global sales opportunity (adapted: the phone "
        "country code becomes a customer-id digit prefix, and 'never "
        "ordered' becomes 'no order since 2000' — every fixture "
        "customer has some order). The signature survives: an "
        "uncorrelated global-average scalar subquery (computed as "
        "scaled-BIGINT mean so the > compare is exact), a correlated "
        "NOT EXISTS anti join against the date-filtered orders scan, "
        "and the prefix re-grouping of survivors."
    ),
)
def sql_tpch_q22(spark, sf_dir):
    acc = _money_acc(
        spark,
        sf_dir,
        "sql_tpch_q22 totacctbal",
        scale=10**2,
        table="customer",
        bound=CUSTOMER_ACCTBAL_BOUND,
    )
    register_views(spark, sf_dir)
    return spark.sql(_q22_sql(acc))


SPECS = [
    sql_tpch_q2,
    sql_tpch_q4,
    sql_tpch_q6,
    sql_tpch_q7,
    sql_tpch_q8,
    sql_tpch_q9,
    sql_tpch_q11,
    sql_tpch_q12,
    sql_tpch_q13,
    sql_tpch_q14,
    sql_tpch_q15,
    sql_tpch_q16,
    sql_tpch_q17,
    sql_tpch_q19,
    sql_tpch_q20,
    sql_tpch_q21,
    sql_tpch_q22,
]
