"""Graph-analytics specs: link analysis over lake-derived edge lists.

Derivation: the reference's user→artifact mapping (email_mapping.py) is
an entity graph; the lake-scale generalizations are connected components
(``dedup_cluster``, operators/components.py) and PageRank-style link
analysis (operators/pagerank.py). The supplier—part bipartite graph from
lineitem stands in for any entity co-occurrence graph.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from odl_etl_spark.io.sources import load_table
from odl_etl_spark.operators.pagerank import DAMP_DEN, DAMP_NUM, SCALE, pagerank_fixed
from odl_etl_spark.queries.base import spec


def _pagerank_oracle(iterations: int = 3, k: int = 20) -> str:
    """Chained-CTE replica of the fixed-point iteration. All arithmetic
    is BIGINT (contributions are exact integer floor divisions), so the
    engines agree bit-for-bit regardless of aggregation order."""
    prev, chain = "r0", ""
    for i in range(1, iterations + 1):
        chain += f""", s{i} AS (
      SELECT ed.dst, SUM(r.rank // ed.outdeg) AS s
      FROM ed JOIN {prev} r ON r.node = ed.src GROUP BY ed.dst
    ), r{i} AS (
      SELECT n.node,
             (SELECT base FROM consts)
               + COALESCE(s{i}.s, 0) * {DAMP_NUM} // {DAMP_DEN} AS rank
      FROM nodes n LEFT JOIN s{i} ON s{i}.dst = n.node
    )"""
        prev = f"r{i}"
    return f"""
    WITH raw AS (
      SELECT DISTINCT 's' || l_suppkey AS src, 'p' || l_partkey AS dst
      FROM lineitem
    ), e AS (
      SELECT src, dst FROM raw UNION SELECT dst, src FROM raw
    ), deg AS (
      SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src
    ), nodes AS (SELECT src AS node FROM deg),
    consts AS (
      SELECT ({SCALE} - {SCALE} * {DAMP_NUM} // {DAMP_DEN})
               // (SELECT COUNT(*) FROM nodes) AS base,
             {SCALE} // (SELECT COUNT(*) FROM nodes) AS init
    ), ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg ON deg.src = e.src),
    r0 AS (SELECT node, (SELECT init FROM consts) AS rank FROM nodes){chain}
    SELECT node, CAST(rank AS BIGINT) AS rank FROM {prev}
    ORDER BY rank DESC, node ASC LIMIT {k}
"""


@spec(
    "graph_pagerank",
    _pagerank_oracle(iterations=3, k=20),
    doc=(
        "PageRank (3 fixed iterations, damping 0.85) over the symmetrized "
        "supplier—part co-occurrence graph, top 20 nodes. The whole "
        "iteration runs in scaled BIGINT arithmetic "
        "(operators/pagerank.py): per-edge contributions are exact floor "
        "divisions and damping is the ratio 17/20, so ranks are "
        "bit-identical across engines and cluster sizes — float PageRank "
        "is order-dependent and would never hash-match. Per round: one "
        "node-keyed join + one hash agg; the rank table is node-sized, "
        "the edge⋈degree join is precomputed once outside the loop."
    ),
)
def graph_pagerank(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    edges = l.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    ).distinct()
    r = pagerank_fixed(edges, iterations=3)
    return r.orderBy(F.col("rank").desc(), F.col("node").asc()).limit(20)


@spec(
    "graph_triangles",
    """
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
    ), stats AS (SELECT SUM(n) AS tot, COUNT(*) AS cnt FROM pairs),
    edges AS (
      SELECT brand_a, brand_b FROM pairs CROSS JOIN stats
      WHERE n * cnt > tot
    ), tris AS (
      SELECT e1.brand_a AS a, e1.brand_b AS b, e2.brand_b AS c
      FROM edges e1
      JOIN edges e2 ON e2.brand_a = e1.brand_b
      JOIN edges e3 ON e3.brand_a = e1.brand_a AND e3.brand_b = e2.brand_b
    ), roles AS (
      SELECT a AS brand FROM tris
      UNION ALL SELECT b FROM tris
      UNION ALL SELECT c FROM tris
    )
    SELECT brand, COUNT(*) AS n_triangles
    FROM roles GROUP BY brand
    """,
    doc=(
        "Triangle counting over the above-mean-support brand "
        "co-occurrence graph: per-order brand sets -> weighted pair "
        "edges (one fact shuffle) -> keep edges whose support exceeds "
        "the mean (integer cross-check against a 1-row broadcast "
        "aggregate, no float threshold) -> the classic ordered "
        "edges three-way self-join (a<b<c, each triangle counted "
        "once) -> per-node participation counts. The edge table is "
        "vocabulary-sized, so the three-way join is over a tiny "
        "relation regardless of fact scale - the standard "
        "node-iterator shape. Completes the graph family "
        "(pagerank, components, triangles)."
    ),
)
def graph_triangles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count("*").alias("n"))
    )
    stats = pairs.agg(
        F.sum("n").alias("tot"), F.count("*").alias("cnt")
    )
    edges = (
        pairs.crossJoin(F.broadcast(stats))
        .where(F.col("n") * F.col("cnt") > F.col("tot"))
        .select("brand_a", "brand_b")
    )
    # Lineage cut before the self-joins (round-15 shuffle audit): edges
    # is read by THREE join aliases and tris by three union branches, so
    # without a cut the whole fact pipeline (scan + distinct shuffle +
    # pair shuffle) re-plans under every alias — 100 planned exchanges
    # for a ~300-row relation. Materializing the vocabulary-sized edge
    # table once and broadcasting it through the triangle join leaves
    # exactly the intended shape: one fact shuffle lane + a broadcast
    # three-way join (4 exchanges total, ×25 fewer).
    from odl_etl_spark.operators.materialize import materialize

    edges = materialize(edges)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tris = (
        e1.join(F.broadcast(e2), F.col("e2.brand_a") == F.col("e1.brand_b"))
        .join(
            F.broadcast(e3),
            (F.col("e3.brand_a") == F.col("e1.brand_a"))
            & (F.col("e3.brand_b") == F.col("e2.brand_b")),
        )
        .select(
            F.col("e1.brand_a").alias("a"),
            F.col("e1.brand_b").alias("b"),
            F.col("e2.brand_b").alias("c"),
        )
    )
    roles = (
        tris.select(F.col("a").alias("brand"))
        .unionAll(tris.select(F.col("b").alias("brand")))
        .unionAll(tris.select(F.col("c").alias("brand")))
    )
    return roles.groupBy("brand").agg(F.count("*").alias("n_triangles"))


SPECS = [
    graph_pagerank,
    graph_triangles,
]
