"""Similarity-search specs over the embeddings table (BASELINE mandate).

Cosine math is double-accumulated in array order on both engines
(Spark: F.aggregate fold; DuckDB: SUM over zipped UNNEST), making the
scores bit-reproducible — the precondition for hash-matching top-k.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from odl_etl_spark.functions.numeric import roundn
from odl_etl_spark.functions.vectors import cosine
from odl_etl_spark.io.sources import load_table
from odl_etl_spark.operators.similarity import IvfIndex, label_centroids, topk_cosine
from odl_etl_spark.queries.base import spec

# Zipped-unnest double-precision cosine between two list<float> exprs.
_COS = """
    (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
     FROM (SELECT UNNEST({a}) AS x, UNNEST({b}) AS y) z)
    / (SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
             FROM (SELECT UNNEST({a}) AS x) z))
       * SQRT((SELECT SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
               FROM (SELECT UNNEST({b}) AS y) z)))
"""


def _probe_vec(spark, sf_dir, vec_id: int = 0) -> list[float]:
    # The probe is one tiny row — driver-side fetch then literal broadcast
    # is the correct pattern (identical to broadcasting a parameter).
    row = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == vec_id)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row[0]]


@spec(
    "sim_topk",
    f"""
    WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id,
             ROUND(({_COS.format(a='e.embedding', b='probe.p')}) * 1000000) / 1000000
               AS cos_sim
      FROM embeddings e, probe
      WHERE e.vec_id <> 0
    )
    SELECT vec_id, cos_sim FROM scored
    ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """,
    doc=(
        "Exact brute-force cosine top-10 for a probe vector: one codegen'd "
        "scan + TakeOrderedAndProject, zero shuffles of the corpus."
    ),
)
def sim_topk(spark, sf_dir):
    probe = _probe_vec(spark, sf_dir, 0)
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    return topk_cosine(e, probe, k=10, round_to=6)


@spec(
    "sim_pairwise_label",
    f"""
    SELECT a.label, COUNT(*) AS n_pairs,
           ROUND(AVG({_COS.format(a='a.embedding', b='b.embedding')}) * 10000) / 10000
             AS avg_cos
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    GROUP BY a.label
    """,
    doc=(
        "Average intra-label pairwise cosine (cluster cohesion) WITHOUT "
        "the O(n²)-per-label self-join: since cos(a,b) = v̂a·v̂b, the sum "
        "over all pairs is derivable from the per-label sum of normalized "
        "vectors — Σ_{a<b} v̂a·v̂b = (‖Σv̂‖² − Σ‖v̂‖²)/2 and each ‖v̂‖² = 1, "
        "so avg_cos = (‖S‖² − n) / (n(n−1)). One posexplode + two hash "
        "aggregations, zero joins of the corpus; the oracle still computes "
        "the literal all-pairs average, so the identity itself is what is "
        "being differentially verified."
    ),
)
def sim_pairwise_label(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    from odl_etl_spark.functions.vectors import norm

    v = F.col("embedding").cast("array<double>")
    # (label, pos, normalized component): the per-row norm is computed
    # once and carried through the generator select.
    ex = e.select(
        "label", norm(v).alias("_nrm"), F.posexplode(v).alias("_pos", "_x")
    ).select("label", "_pos", (F.col("_x") / F.col("_nrm")).alias("_xn"))
    # Each vector contributes one element per position, so the per-(label,
    # pos) row count IS the label's vector count — no separate count+join.
    comp = ex.groupBy("label", "_pos").agg(
        F.sum("_xn").alias("_sx"), F.count("*").alias("_c")
    )
    s2 = comp.groupBy("label").agg(
        F.sum(F.col("_sx") * F.col("_sx")).alias("_s2"), F.max("_c").alias("_n")
    )
    n = F.col("_n").cast("double")
    return s2.where(F.col("_n") >= 2).select(
        "label",
        (F.col("_n") * (F.col("_n") - 1) / 2).cast("long").alias("n_pairs"),
        roundn((F.col("_s2") - n) / (n * (n - 1)), 4).alias("avg_cos"),
    )


@spec(
    "sim_ann_ivf",
    None,  # ANN recall is index-specific — rows-only; unit test checks recall
    doc=(
        "IVF approximate NN: assign vectors to 8 deterministic centroid "
        "cells, probe the 2 nearest cells only — the partition-pruned scale "
        "path (search cost ~nprobe/n_cells of brute force)."
    ),
)
def sim_ann_ivf(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    probe = _probe_vec(spark, sf_dir, 0)
    index = IvfIndex.build(e, n_cells=8)
    assigned = index.assign(e.where(F.col("vec_id") != 0))
    return index.search(assigned, probe, k=10, nprobe=2)


@spec(
    "emb_centroid_dist",
    """
    WITH ex AS (
      SELECT label, vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ), cent AS (
      SELECT label, i, AVG(x) AS c FROM ex GROUP BY label, i
    ), dots AS (
      SELECT e.label, e.vec_id,
             SUM(e.x * c.c) AS dot,
             SQRT(SUM(e.x * e.x)) AS nv,
             SQRT(SUM(c.c * c.c)) AS nc
      FROM ex e JOIN cent c ON e.label = c.label AND e.i = c.i
      GROUP BY e.label, e.vec_id
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(AVG(dot / (nv * nc)) * 10000) / 10000 AS avg_cos_to_centroid
    FROM dots GROUP BY label
    """,
    doc=(
        "Per-label centroid (k-means E-step, fully distributed posexplode "
        "→ per-dim avg) and average cosine of members to their centroid — "
        "cluster-cohesion diagnostics for embedding corpora."
    ),
)
def emb_centroid_dist(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cents = label_centroids(e)
    return (
        e.join(F.broadcast(cents), "label")
        .select("label", cosine("embedding", "centroid").alias("_cos"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            roundn(F.avg("_cos"), 4).alias("avg_cos_to_centroid"),
        )
    )


SPECS = [sim_topk, sim_pairwise_label, sim_ann_ivf, emb_centroid_dist]
