"""End-to-end pipeline parity tests against the reference's flows."""

from __future__ import annotations

import hashlib
import os
import tarfile

import pyspark.sql.functions as F

from odl_etl_spark.pipelines import run_artifact_sync, run_user_map


def test_user_map_pipeline_reference_semantics(spark, tmp_path):
    users = spark.createDataFrame(
        [("alice", "alice@example.com"), ("bob", "bob@example.com")],
        "username string, email string",
    )
    out = str(tmp_path / "user_map")
    n = run_user_map(users, out, salt="pepper")
    assert n == 2
    got = {r["username"]: r["hashed_email"] for r in spark.read.parquet(out).collect()}
    # Byte-identical to the reference's sha256(salt + email).hexdigest().
    assert got["alice"] == hashlib.sha256(b"pepperalice@example.com").hexdigest()
    assert set(spark.read.parquet(out).columns) == {"username", "hashed_email"}


def test_user_map_daily_partitions_dont_clobber(spark, tmp_path):
    out = str(tmp_path / "user_map_daily")
    day1 = spark.createDataFrame([("a", "a@x.com")], "username string, email string")
    day2 = spark.createDataFrame(
        [("b", "b@x.com"), ("c", "c@x.com")], "username string, email string"
    )
    run_user_map(day1, out, ds="20240101")
    run_user_map(day2, out, ds="20240102")
    per_ds = {
        str(r["ds"]): r["n"]  # partition discovery infers ds as int
        for r in spark.read.parquet(out).groupBy("ds").agg(F.count("*").alias("n")).collect()
    }
    assert per_ds == {"20240101": 1, "20240102": 2}


def test_artifact_sync_pipeline(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    # Two course-export-shaped tarballs (the reference's unit of work).
    for cid in ["course-v1_A", "course-v1_B"]:
        src = tmp_path / f"{cid}.txt"
        src.write_text(f"content of {cid}")
        with tarfile.open(landing / f"{cid}.tar.gz", "w:gz") as tar:
            tar.add(src, arcname="olx.txt")
    out = str(tmp_path / "lake")
    messages: list[str] = []
    n = run_artifact_sync(
        spark, str(landing), out, ds="20240101", on_success=messages.append
    )
    assert n == 2
    rows = {r["artifact_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {"course-v1_A", "course-v1_B"}
    assert all(r["length"] > 0 and bytes(r["content"])[:2] == b"\x1f\x8b" for r in rows.values())
    assert messages and "2 artifacts" in messages[0]


def test_artifact_sync_failure_hook(spark, tmp_path):
    failures: list[str] = []
    try:
        run_artifact_sync(
            spark,
            str(tmp_path / "missing_dir"),
            str(tmp_path / "lake"),
            ds="20240101",
            on_failure=failures.append,
        )
    except Exception:
        pass
    assert failures and "failed" in failures[0]
