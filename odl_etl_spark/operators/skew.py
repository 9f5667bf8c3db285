"""Skew-aware join: key salting.

AQE's skew-join split handles most skew at runtime (enabled in
``session.DEFAULT_CONF``), but it only splits *sort-merge* partitions;
pathological producer-side skew (one key = 30% of a 100 TB fact table)
is still better handled structurally. ``salted_join`` spreads each hot
fact key over ``n_salts`` shuffle partitions by appending a round-robin
salt to the fact side and exploding the dim side ``n_salts`` ways — dim
rows are replicated (cheap, dims are small), fact rows are not.

Only ``inner`` and ``left`` (fact-preserving) joins are supported: under
salting each dim row exists once per salt, so a right/full outer join
would emit every *unmatched* dim row ``n_salts`` times.
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
    key). Deterministic output; the salt is internal only. The salt is
    ``monotonically_increasing_id() mod n_salts`` — ids are consecutive
    within a partition, so a hot key's rows round-robin *exactly*
    uniformly over the ``n_salts`` shuffle buckets (a hash of the id
    would only be approximately uniform).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only, got {how!r}: "
            "replicated dim rows would duplicate outer-side output"
        )
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_fact.join(exploded_dim, [on, "_salt"], how)
    return joined.drop("_salt")
