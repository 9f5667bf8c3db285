"""Skew-aware join: key salting.

AQE's skew-join split handles most skew at runtime (enabled in
``session.DEFAULT_CONF``), but it only splits *sort-merge* partitions;
pathological producer-side skew (one key = 30% of a 100 TB fact table)
is still better handled structurally. ``salted_join`` spreads each hot
fact key over ``n_salts`` shuffle partitions by appending a random salt
to the fact side and exploding the dim side ``n_salts`` ways — dim rows
are replicated (cheap, dims are small), fact rows are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on ``on`` with the fact side salted.

    Result columns = fact columns + dim columns (minus the duplicate
    key). Deterministic output; the salt is internal only.
    """
    salted_fact = fact.withColumn(
        "_salt", (F.xxhash64(F.monotonically_increasing_id()) % n_salts + n_salts) % n_salts
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_fact.join(exploded_dim, [on, "_salt"], how)
    return joined.drop("_salt")
