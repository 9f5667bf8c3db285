"""Partition-scoped upsert tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from odl_etl_spark.operators.upsert import upsert_partitioned


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ds string")


def test_upsert_replaces_matches_keeps_rest_inserts_new(spark, tmp_path):
    path = str(tmp_path / "ds_table")
    base = _df(spark, [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")])
    base.repartition("ds").write.partitionBy("ds").parquet(path)

    updates = _df(spark, [(2, "B!", "d1"), (9, "new", "d1")])
    n = upsert_partitioned(spark, path, updates, keys=["k"])
    assert n == 1  # only d1 rewritten

    got = {(r["k"], r["ds"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {
        (1, "d1"): "a",     # kept
        (2, "d1"): "B!",    # replaced
        (9, "d1"): "new",   # inserted
        (3, "d2"): "c",     # untouched partition intact
    }


def test_upsert_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "ds_table2")
    _df(spark, [(1, "a", "d1")]).write.partitionBy("ds").parquet(path)
    updates = _df(spark, [(1, "a2", "d1")])
    upsert_partitioned(spark, path, updates, keys=["k"])
    upsert_partitioned(spark, path, updates, keys=["k"])
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 1 and rows[0]["v"] == "a2"


def test_upsert_empty_updates_noop(spark, tmp_path):
    path = str(tmp_path / "ds_table3")
    _df(spark, [(1, "a", "d1")]).write.partitionBy("ds").parquet(path)
    empty = _df(spark, []).limit(0)
    assert upsert_partitioned(spark, path, empty, keys=["k"]) == 0
    assert spark.read.parquet(path).count() == 1


def test_upsert_first_write_creates_dataset(spark, tmp_path):
    path = str(tmp_path / "fresh")
    updates = _df(spark, [(1, "x", "d1"), (2, "y", "d2")])
    n = upsert_partitioned(spark, path, updates, keys=["k"])
    assert n == 2
    assert spark.read.parquet(path).count() == 2


def test_upsert_noncanonical_partition_values_round_trip(spark, tmp_path):
    """Partition values whose inferred-type string form differs from the
    original (ds='01' would infer as int 1 → '1') must round-trip: the
    merge and the swap must keep writing to ds=01, never forking a new
    ds=1 partition alongside a stale ds=01 (ADVICE r4, medium)."""
    import os

    path = str(tmp_path / "ds_zero_pad")
    base = _df(spark, [(1, "a", "01"), (2, "b", "01"), (3, "c", "010")])
    base.repartition("ds").write.partitionBy("ds").parquet(path)

    updates = _df(spark, [(2, "B!", "01"), (9, "new", "01")])
    n = upsert_partitioned(spark, path, updates, keys=["k"])
    assert n == 1

    # Exactly the original directories — no ds=1 fork, stale ds=01 gone.
    dirs = sorted(d for d in os.listdir(path) if d.startswith("ds="))
    assert dirs == ["ds=01", "ds=010"]
    got = {
        (r["k"], r["ds"]): r["v"]
        for r in spark.read.schema("k long, v string, ds string")
        .parquet(path)
        .collect()
    }
    assert got == {
        (1, "01"): "a",
        (2, "01"): "B!",
        (9, "01"): "new",
        (3, "010"): "c",
    }


def test_upsert_adversarial_partition_values_round_trip(spark, tmp_path):
    """One partition per classically type-inference-ambiguous string:
    every directory must survive an upsert byte-identically (none may
    collapse to its inferred-type canonical form)."""
    import os

    tricky = ["01", "1", "1.0", "001", "2024-01-01", "true", "1e3", "0x10"]
    path = str(tmp_path / "ds_tricky")
    base = _df(spark, [(i, "v", ds) for i, ds in enumerate(tricky)])
    base.repartition("ds").write.partitionBy("ds").parquet(path)

    # Touch half the partitions; the other half must remain untouched.
    updates = _df(spark, [(i, "V!", ds) for i, ds in enumerate(tricky) if i % 2 == 0])
    n = upsert_partitioned(spark, path, updates, keys=["k"])
    assert n == len(tricky) // 2

    dirs = sorted(d[3:] for d in os.listdir(path) if d.startswith("ds="))
    assert dirs == sorted(tricky)
    got = {
        r["ds"]: r["v"]
        for r in spark.read.schema("k long, v string, ds string").parquet(path).collect()
    }
    assert got == {ds: ("V!" if i % 2 == 0 else "v") for i, ds in enumerate(tricky)}


def test_upsert_cleans_staging_on_success(spark, tmp_path):
    """The per-run staging sibling must be deleted after a successful
    swap (and only then — on failure it is the durable copy)."""
    import os

    path = str(tmp_path / "ds_staging")
    _df(spark, [(1, "a", "d1")]).write.partitionBy("ds").parquet(path)
    upsert_partitioned(spark, path, _df(spark, [(1, "a2", "d1")]), keys=["k"])
    leftovers = [d for d in os.listdir(tmp_path) if "upsert-staging" in d]
    assert leftovers == []


def test_upsert_schema_mismatch_raises_not_data_loss(spark, tmp_path):
    """A malformed updates frame must raise, not silently become a
    'first write' that drops the kept rows of touched partitions."""
    import pytest
    from pyspark.errors import AnalysisException

    path = str(tmp_path / "ds_table_mismatch")
    _df(spark, [(1, "a", "d1"), (2, "b", "d1")]).write.partitionBy("ds").parquet(path)
    bad = spark.createDataFrame([(2, "d1")], "k long, ds string")  # missing v
    with pytest.raises(AnalysisException):
        upsert_partitioned(spark, path, bad, keys=["k"])
    # Dataset untouched.
    assert spark.read.parquet(path).count() == 2
