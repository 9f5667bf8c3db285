"""Vector math over ``array<float>`` columns as pure SQL expressions.

The 100 TB rule for embedding columns: never row-at-a-time Python.
``F.zip_with`` + ``F.aggregate`` compile to codegen'd loops over the
array — JVM-side, spillable, shardable. Accumulate in DOUBLE so results
are reproducible against other engines (float accumulation order is not).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def vec_lit(vec) -> Column:
    """``array<double>`` literal in ONE parser call.

    The operator form (``F.array(*[F.lit(float(v)) ...])``) costs one
    py4j round-trip per element per call — ~40 ms for a 64-dim vector,
    repeated for every probe/centroid literal of every bench rep (r17
    cProfile: the ANN ingest key spent ~4 s/build in this chatter
    class). ``repr()`` round-trips IEEE doubles exactly and the parser
    reads ``<v>D`` as a DOUBLE literal, so the parsed tree is identical
    to the operator form. Non-finite values (no SQL literal form) and
    empty vectors fall back to the operator construction."""
    vals = [float(v) for v in vec]
    if not vals or not all(math.isfinite(v) for v in vals):
        return F.array(*[F.lit(v) for v in vals])
    return F.expr("array({})".format(", ".join(f"{v!r}D" for v in vals)))


def mat_lit(rows) -> Column:
    """``array<array<double>>`` literal in one parser call (the nested
    companion of ``vec_lit`` — IVF centroid tables, k-means centroids)."""
    mats = [[float(v) for v in r] for r in rows]
    if not mats or any(
        not r or not all(math.isfinite(v) for v in r) for r in mats
    ):
        return F.array(*[F.array(*[F.lit(v) for v in r]) for r in mats])
    inner = ", ".join(
        "array({})".format(", ".join(f"{v!r}D" for v in r)) for r in mats
    )
    return F.expr(f"array({inner})")


def _dbl(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_dbl(a), _dbl(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
