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
    reports = []
    n = run_artifact_sync(
        spark, str(landing), out, ds="20240101", on_success=reports.append
    )
    assert n == 2
    rows = {r["artifact_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {"course-v1_A", "course-v1_B"}
    assert all(r["length"] > 0 and bytes(r["content"])[:2] == b"\x1f\x8b" for r in rows.values())
    assert reports and reports[0].ok and reports[0].artifact_count == 2
    assert "2 artifacts" in reports[0].summary()


def test_artifact_sync_failure_hook(spark, tmp_path):
    reports = []
    try:
        run_artifact_sync(
            spark,
            str(tmp_path / "missing_dir"),
            str(tmp_path / "lake"),
            ds="20240101",
            on_failure=reports.append,
        )
    except Exception:
        pass
    assert reports and not reports[0].ok and reports[0].error
    assert "failed" in reports[0].summary()


def test_notifiers_post_reference_shaped_payloads(tmp_path):
    """SlackNotifier must POST the reference's json body shape
    (mitx_etl.py:164-172) and swallow delivery errors; the healthcheck
    GET must raise on failure (mitx_etl.py:186-192)."""
    import pytest

    from odl_etl_spark.pipelines.notifications import (
        HealthcheckNotifier,
        SlackNotifier,
        SyncReport,
        fanout,
    )

    calls = []

    def recorder(url, payload):
        calls.append((url, payload))

    report = SyncReport(ds="20240101", out_path="/lake", source="landing",
                        artifact_count=3)
    slack = SlackNotifier("https://hooks.invalid/T000", bot_username="bot",
                          bot_emoji=":x:", transport=recorder)
    hc = HealthcheckNotifier("https://hc.invalid/ping", transport=recorder)
    fanout(slack, hc)(report)

    assert calls[0][0] == "https://hooks.invalid/T000"
    assert calls[0][1] == {
        "text": "Successfully exported 3 artifacts from landing for ds=20240101",
        "username": "bot",
        "icon_emoji": ":x:",
    }
    assert calls[1] == ("https://hc.invalid/ping", None)  # GET, no body

    def broken(url, payload):
        raise OSError("connection refused")

    # Slack failures are best-effort (warn + continue)…
    SlackNotifier("https://hooks.invalid/x", transport=broken)(report)
    # …healthcheck failures raise.
    with pytest.raises(OSError):
        HealthcheckNotifier("https://hc.invalid/x", transport=broken)(report)


def test_artifact_sync_from_settings_document(spark, tmp_path):
    """The mitx-shaped settings document drives the full pipeline with
    configured notification hooks (config-document parity)."""
    import json

    from odl_etl_spark.pipelines.config import (
        ArtifactSyncConfig,
        run_artifact_sync_from_config,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    src = tmp_path / "c.txt"
    src.write_text("x")
    with tarfile.open(landing / "course-v1_C.tar.gz", "w:gz") as tar:
        tar.add(src, arcname="olx.txt")

    settings = {
        "landing_dir": str(landing),
        "out_path": str(tmp_path / "lake"),
        "ds": "20240102",
        "Slack": {"webhook_url": "https://hooks.invalid/T1", "bot_username": "b"},
        "Healthchecks": {"url": "https://hc.invalid/p"},
    }
    cfg_path = tmp_path / "settings.json"
    cfg_path.write_text(json.dumps(settings))
    cfg = ArtifactSyncConfig.from_file(str(cfg_path))
    assert cfg.glob == "*.tar.gz" and cfg.healthcheck_url == "https://hc.invalid/p"

    calls = []
    n = run_artifact_sync_from_config(
        spark, cfg, transport=lambda url, payload: calls.append((url, payload))
    )
    assert n == 1
    # Slack POST then healthcheck GET, success-path order.
    assert [u for u, _ in calls] == ["https://hooks.invalid/T1", "https://hc.invalid/p"]
    assert "1 artifacts" in calls[0][1]["text"]


def test_user_map_config_yaml_roundtrip(tmp_path):
    """email_mapping-shaped YAML settings load into the typed config;
    missing required keys raise (the reference hard-exits)."""
    import pytest

    from odl_etl_spark.pipelines.config import UserMapConfig

    p = tmp_path / "email_settings.yml"
    p.write_text(
        "db_url: jdbc:postgresql://db.invalid/app\n"
        "query: select username, email from users\n"
        "out_path: /lake/user_map\n"
        "hash_salt: pepper\n"
    )
    cfg = UserMapConfig.from_file(str(p))
    assert cfg.hash_salt == "pepper" and cfg.key_col == "username"

    bad = tmp_path / "bad.yml"
    bad.write_text("db_url: jdbc:postgresql://db.invalid/app\n")
    with pytest.raises(KeyError):
        UserMapConfig.from_file(str(bad))


def test_curation_funnel_end_to_end(spark, sf_dir, tmp_path):
    """The composed curation DAG: funnel stages partition the corpus,
    survivors satisfy every gate, the write is partitioned + idempotent."""
    import pyspark.sql.functions as F

    from odl_etl_spark.io.sources import load_table
    from odl_etl_spark.pipelines.curation import curate_corpus

    out = str(tmp_path / "curated")
    kept, funnel = curate_corpus(spark, sf_dir, out)
    stages = {r.stage: r.n_docs for r in funnel.collect()}
    corpus_n = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("source") != "src0")
        .count()
    )
    # every doc lands in exactly one funnel bucket
    assert sum(stages.values()) == corpus_n
    assert stages.get("kept", 0) == kept.count() > 0
    # at least one reduction stage actually fired on the fixture
    assert sum(v for k, v in stages.items() if k != "kept") > 0

    back = spark.read.parquet(out)
    assert back.count() == stages["kept"]
    assert "source" in back.columns  # partition column survives read
    # survivors are unique by normalized text (exact dedup held)
    n_unique = back.select(F.trim(F.lower("text"))).distinct().count()
    assert n_unique == back.count()
    # idempotent re-run: dynamic overwrite, same result
    curate_corpus(spark, sf_dir, out)
    assert spark.read.parquet(out).count() == stages["kept"]


def test_curation_runs_from_settings_document(spark, sf_dir, tmp_path):
    import json

    from odl_etl_spark.pipelines.config import (
        CurationConfig,
        run_curation_from_config,
    )

    doc = tmp_path / "curation.json"
    out = str(tmp_path / "curated_cfg")
    doc.write_text(json.dumps({"sf_dir": sf_dir, "out_path": out, "min_words": 10}))
    cfg = CurationConfig.from_file(str(doc))
    assert cfg.min_words == 10 and cfg.held_out_source == "src0"
    stages = run_curation_from_config(spark, cfg)
    assert stages.get("kept", 0) > 0
    assert spark.read.parquet(out).count() == stages["kept"]
    with __import__("pytest").raises(KeyError, match="out_path"):
        bad = tmp_path / "bad.json"
        bad.write_text(json.dumps({"sf_dir": sf_dir}))
        CurationConfig.from_file(str(bad))


def test_curation_null_text_counts_as_quality_reject(spark, sf_dir, tmp_path):
    """ADVICE r5: ~NULL is NULL, so un-guarded gate flags let a null-text
    doc fall through every when() into 'exact_dup'. The coalesce guard
    must route it to 'quality' (and keep the partition-sum invariant)."""
    import pyspark.sql.functions as F

    from odl_etl_spark.io.sources import load_table
    from odl_etl_spark.pipelines.curation import curate_corpus

    src = str(tmp_path / "mini_sf")
    docs = (
        load_table(spark, sf_dir, "documents")
        .limit(50)
        .unionByName(
            spark.createDataFrame(
                [(10_000_001, None, "en", "src1", 0)],
                "doc_id long, text string, lang string, source string, n_chars long",
            )
        )
    )
    import os

    os.makedirs(src, exist_ok=True)
    docs.toPandas().to_parquet(os.path.join(src, "documents.parquet"))

    _, funnel = curate_corpus(spark, src, str(tmp_path / "curated_null"))
    rows = spark.createDataFrame(funnel.collect(), funnel.schema)
    stages = {r.stage: r.n_docs for r in rows.collect()}
    corpus_n = docs.where(F.col("source") != "src0").count()
    assert sum(stages.values()) == corpus_n
    # the null-text doc is a quality reject, not a phantom exact_dup
    assert stages.get("quality", 0) >= 1
