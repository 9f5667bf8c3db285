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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from odl_etl_spark.functions.vectors import cosine, l2_distance
from odl_etl_spark.io.sources import spread


def _vec_lit(vec: list[float]):
    return F.array(*[F.lit(float(v)) for v in vec])


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

    def assign(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Add ``cell_id`` = nearest centroid (expression argmin, no UDF).
        At scale, write this out ``partitionBy("cell_id")`` once."""
        return spread(df).withColumn("cell_id", self._nearest_cell_expr(vec_col))

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
