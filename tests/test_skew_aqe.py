"""AQE skew-join validation (VERDICT.md r4, Next-round #7).

Proves the division of labor claimed in ``operators/skew.py``: on a
synthetically skewed key, AQE's runtime skew split handles the PLAIN
join (plan carries ``SortMergeJoin(skew=true)``) — so ``salted_join``
is demonstrably the structural *fallback*, not the default — and also
pins the case where AQE *cannot* fire (join output feeding an
aggregation keyed on the join key needs the unsplit hash distribution),
which is exactly the case the salted path exists for.

Probe-scale notes (found while building this, all scale-relevant):
- Column pruning makes a "skewed" table not skewed in BYTES if the
  payload isn't consumed downstream — skew is a property of the shuffle,
  not the table.
- With only a handful of shuffle partitions, coalesce-first merges the
  small partitions and drags the median up to the hot partition; the
  probe disables coalescing (at cluster scale, thousands of partitions
  keep the median meaningful and both optimizations compose).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_PROBE_CONF = {
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "8",
}


def _skewed_sides(spark):
    # One hot key = 75% of the fact table; incompressible payload so the
    # hot shuffle partition is ~10 MB against a ~0.5 MB median.
    fact = spark.range(200_000).select(
        F.when(F.col("id") < 150_000, F.lit(0)).otherwise(F.col("id") % 50).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    dim = spark.range(50).select(F.col("id").alias("k"), F.lit("d").alias("dval"))
    return fact, dim


def _with_probe_conf(spark, fn):
    saved = {}
    for k, v in _PROBE_CONF.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        return fn()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_plain_join(spark):
    fact, dim = _skewed_sides(spark)

    def run():
        agg = fact.join(dim, "k").agg(
            F.count("*").alias("n"), F.max(F.length("payload")).alias("plen")
        )
        [row] = agg.collect()
        assert (row["n"], row["plen"]) == (200_000, 64)
        return agg._jdf.queryExecution().executedPlan().toString()

    plan = _with_probe_conf(spark, run)
    assert "skew=true" in plan, plan


def test_keyed_agg_downstream_blocks_aqe_split(spark):
    """When the join output feeds a groupBy on the join key, splitting
    the skewed partition would break the required hash distribution, so
    AQE declines (without spark.sql.adaptive.forceOptimizeSkewedJoin) —
    the situation operators/skew.py's salted_join is for: salting
    rewrites the plan so no single reducer owns the hot key at all."""
    fact, dim = _skewed_sides(spark)

    def run():
        agg = (
            fact.join(dim, "k")
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.max(F.length("payload")).alias("plen"))
        )
        assert agg.count() == 50
        return agg._jdf.queryExecution().executedPlan().toString()

    plan = _with_probe_conf(spark, run)
    assert "skew=true" not in plan


def test_salted_join_handles_what_aqe_cannot(spark):
    """The salted join produces the same keyed aggregate AQE couldn't
    split — identical results to the plain join, hot key spread over
    n_salts buckets by construction."""
    from odl_etl_spark.operators.skew import salted_join

    fact, dim = _skewed_sides(spark)

    def run():
        plain = (
            fact.join(dim, "k")
            .groupBy("k")
            .agg(F.count("*").alias("n"))
        )
        salted = (
            salted_join(fact, dim, on="k", n_salts=8)
            .groupBy("k")
            .agg(F.count("*").alias("n"))
        )
        return (
            {(r["k"], r["n"]) for r in plain.collect()},
            {(r["k"], r["n"]) for r in salted.collect()},
        )

    a, b = _with_probe_conf(spark, run)
    assert a == b and len(a) == 50
