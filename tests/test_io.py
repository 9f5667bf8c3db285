"""Sink / catalog / multimodal plumbing tests (A6-A9 parity classes)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from odl_etl_spark.io.catalog import recover_partitions, register_parquet_table
from odl_etl_spark.io.sinks import compact, partitioned_write, with_ds
from odl_etl_spark.io.sources import load_table
from odl_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
    sample_video_frames,
)


def test_dynamic_partition_overwrite_preserves_siblings(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_part")
    orders = with_ds(load_table(spark, sf_dir, "orders"), "o_orderdate", "yyyy")
    partitioned_write(orders, out, ("ds",))
    before = {
        r["ds"]: r["n"]
        for r in spark.read.parquet(out).groupBy("ds").agg(F.count("*").alias("n")).collect()
    }
    assert len(before) > 1

    # Overwrite ONE partition with a single synthetic row; siblings intact.
    one = orders.where(F.col("ds") == max(before)).limit(1)
    partitioned_write(one, out, ("ds",))
    after = {
        r["ds"]: r["n"]
        for r in spark.read.parquet(out).groupBy("ds").agg(F.count("*").alias("n")).collect()
    }
    assert after[max(before)] == 1
    for ds, n in before.items():
        if ds != max(before):
            assert after[ds] == n


def test_catalog_register_and_recover(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_part")
    ev = with_ds(load_table(spark, sf_dir, "events"), "ts", "yyyyMMdd")
    partitioned_write(ev, out, ("ds",))
    register_parquet_table(spark, "events_cat", out, ("ds",))
    n_parts = recover_partitions(spark, "events_cat")
    assert n_parts == ev.select("ds").distinct().count()
    # Partition-pruned read through the catalog matches the source count.
    one_ds = ev.select("ds").distinct().orderBy("ds").head()["ds"]
    got = spark.sql(
        f"SELECT COUNT(*) c FROM events_cat WHERE ds = '{one_ds}'"
    ).head()["c"]
    assert got == ev.where(F.col("ds") == one_ds).count()
    spark.sql("DROP TABLE events_cat")


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    src = str(tmp_path / "many_files")
    dst = str(tmp_path / "compacted")
    load_table(spark, sf_dir, "orders").repartition(16).write.parquet(src)
    n_before = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_before == 16
    compact(spark, src, dst, target_files=2)
    n_after = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_after == 2
    assert spark.read.parquet(dst).count() == spark.read.parquet(src).count()


def _media_df(spark, n=20):
    rows = [
        (i, "image" if i % 2 == 0 else "video", "application/octet-stream",
         bytes(range(max(i % 251, 1))) * (i + 1), {"src": f"s{i}"})
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_feature_extraction_shapes(spark):
    media = _media_df(spark)
    feats = extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == media.where(F.col("kind") == "image").count()
    for r in rows:
        assert r["width"] >= 16 and r["height"] >= 16
        assert len(r["embedding"]) == 8
        assert r["n_bytes"] > 0
    # Determinism: same bytes → same features.
    again = {r["media_id"]: r["embedding"] for r in extract_image_features(media).collect()}
    assert {r["media_id"]: r["embedding"] for r in rows} == again


def test_video_frame_sampling_fanout(spark):
    media = _media_df(spark)
    frames = sample_video_frames(media, every_n_bytes=64, max_frames=4)
    per = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert all(1 <= r["n"] <= 4 for r in per)
    assert frames.where(F.col("frame_idx") < 0).count() == 0


def test_audio_feature_extraction(spark):
    from odl_etl_spark.operators.multimodal import (
        _FAKE_RATES,
        extract_audio_features,
    )

    rows = [
        (i, "audio", "audio/wav", bytes(range(max(i % 251, 1))) * (i + 1), {})
        for i in range(10)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_audio_features(media).collect()
    assert len(feats) == 10
    by_id = {r["media_id"]: r for r in feats}
    for i, r in by_id.items():
        assert r["sample_rate"] in _FAKE_RATES
        assert r["n_samples"] == len(rows[i][3]) * 4
        assert r["duration_ms"] == r["n_samples"] * 1000 // r["sample_rate"]
        assert 0.0 <= r["rms"] <= 1.0
    again = {r["media_id"]: r["rms"] for r in extract_audio_features(media).collect()}
    assert {r["media_id"]: r["rms"] for r in feats} == again


def test_jdbc_wrapper_validates_args(spark):
    import pytest

    from odl_etl_spark.io.sources import jdbc_source

    with pytest.raises(ValueError):
        jdbc_source(spark, "jdbc:postgresql://x/db")
    with pytest.raises(ValueError):
        jdbc_source(spark, "jdbc:postgresql://x/db", query="q", table="t")


def test_binary_source_reads_blobs(spark, tmp_path):
    from odl_etl_spark.io.sources import binary_source

    p = tmp_path / "blobs"
    p.mkdir()
    (p / "a.bin").write_bytes(b"hello world")
    (p / "b.bin").write_bytes(b"x" * 100)
    df = binary_source(spark, str(p), glob="*.bin")
    rows = {os.path.basename(r["path"]): r for r in df.collect()}
    assert rows["a.bin"]["content"] == bytearray(b"hello world")
    assert rows["b.bin"]["length"] == 100


def test_csv_and_json_sources_roundtrip(spark, tmp_path):
    import json as jsonlib

    from odl_etl_spark.io.sources import csv_source, json_source

    csv_p = tmp_path / "t.csv"
    csv_p.write_text("k,v\n1,a\n2,b\n")
    df = csv_source(spark, str(csv_p), schema="k long, v string")
    assert sorted(map(tuple, df.collect())) == [(1, "a"), (2, "b")]

    json_p = tmp_path / "t.jsonl"
    json_p.write_text("\n".join(jsonlib.dumps({"k": i, "v": f"x{i}"}) for i in range(3)))
    dj = json_source(spark, str(json_p), schema="k long, v string")
    assert dj.count() == 3 and set(dj.columns) == {"k", "v"}


def test_partitioned_write_salted_fanout(spark, sf_dir, tmp_path):
    import glob

    from odl_etl_spark.io.sinks import partitioned_write
    from odl_etl_spark.io.sources import load_table

    out = str(tmp_path / "salted")
    orders = with_ds(load_table(spark, sf_dir, "orders"), "o_orderdate", "yyyy")
    partitioned_write(orders, out, ("ds",), files_per_partition=3)
    # Each ds partition fans out over up to 3 writer tasks/files, and the
    # salted write round-trips losslessly.
    for d in glob.glob(os.path.join(out, "ds=*")):
        n = len(glob.glob(os.path.join(d, "*.parquet")))
        assert 1 <= n <= 3, d
    assert spark.read.parquet(out).count() == orders.count()


def test_ntz_fallback_is_timezone_independent(spark, tmp_path):
    """The timestamp_ntz branch of load_table fires on sessions that
    missed tune_session — exactly the sessions that may also carry a
    non-UTC timezone. The normalized instant must equal the naive value
    read as UTC regardless of spark.sql.session.timeZone."""
    sf = tmp_path / "sf_ntz"
    sf.mkdir()
    # Three naive values: a plain one, one inside America/New_York's
    # spring-forward GAP (02:30 does not exist locally on 2024-03-10 —
    # a session-timezone cast would normalize it forward an hour), and
    # one inside the fall-back OVERLAP (01:30 exists twice on
    # 2024-11-03). Naive-read-as-UTC is well-defined for all three.
    spark.sql(
        "select 1 as user_id, timestamp_ntz'2024-06-15 12:34:56.789' as ts"
        " union all select 2, timestamp_ntz'2024-03-10 02:30:00'"
        " union all select 3, timestamp_ntz'2024-11-03 01:30:00'"
    ).write.parquet(str(sf / "events.parquet"))

    want_us = {
        1: 1718454896789000,  # 2024-06-15T12:34:56.789Z
        2: 1710037800000000,  # 2024-03-10T02:30:00Z (DST-gap wall clock)
        3: 1730597400000000,  # 2024-11-03T01:30:00Z (DST-overlap wall clock)
    }
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = load_table(spark, str(sf), "events")
            assert dict(df.dtypes)["ts"] == "timestamp", tz
            got = {
                r["user_id"]: r["us"]
                for r in df.select(
                    "user_id", F.unix_micros("ts").alias("us")
                ).collect()
            }
            assert got == want_us, (tz, got)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_schema_evolution_merges_partition_schemas(spark, tmp_path):
    """Columns added by newer partitions surface as nullable; old rows
    read NULL — the crawler-reinference shape, at read time."""
    from odl_etl_spark.io.sources import read_evolving

    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").withColumn(
        "ds", F.lit("20240101")
    ).write.partitionBy("ds").parquet(out)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).withColumn("ds", F.lit("20240102")).write.mode("append").partitionBy(
        "ds"
    ).parquet(out)

    df = read_evolving(spark, out)
    assert set(df.columns) == {"id", "name", "score", "ds"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows == {1: None, 2: 9.5}


def test_read_widened_int_to_bigint_across_eras(spark, tmp_path):
    """Era-1 wrote a column as INT, era-2 as BIGINT: mergeSchema refuses
    that layout outright, and read_widened must (a) compute the widened
    schema from per-era footers, (b) read INT32 pages straight into the
    BIGINT column, (c) keep composing with ADDED columns (the
    read_evolving half), and (d) surface the era partition column."""
    import pytest

    from odl_etl_spark.io.sources import read_evolving, read_widened

    out = str(tmp_path / "widening")
    spark.createDataFrame([(1, 1.5)], "k int, x float").write.parquet(
        out + "/era=1"
    )
    spark.createDataFrame(
        [(2**40, 2.5, "late")], "k bigint, x double, note string"
    ).write.parquet(out + "/era=2")

    # The plain mergeSchema path hard-fails on the width conflict —
    # the documented reason read_widened exists.
    with pytest.raises(Exception):
        read_evolving(spark, out).collect()

    df = read_widened(spark, out)
    assert dict(df.dtypes)["k"] == "bigint"
    assert dict(df.dtypes)["x"] == "double"
    rows = {r["k"]: (r["x"], r["note"], r["era"]) for r in df.collect()}
    assert rows[1] == (1.5, None, 1)  # era-1: widened int, NULL late col
    assert rows[2**40] == (2.5, "late", 2)
    # Aggregation runs in the widened lane.
    assert df.agg(F.sum("k")).first()[0] == 2**40 + 1


def test_read_widened_refuses_lossy_conflicts(spark, tmp_path):
    """A conflict outside the lossless lattice (string vs int) must
    raise, never coerce — fail loud is the contract."""
    import pytest

    from odl_etl_spark.io.sources import read_widened

    out = str(tmp_path / "conflict")
    spark.createDataFrame([(1,)], "k int").write.parquet(out + "/era=1")
    spark.createDataFrame([("x",)], "k string").write.parquet(out + "/era=2")
    with pytest.raises(TypeError, match="incompatible era types"):
        read_widened(spark, out)
    # And an empty layout is an explicit error, not an empty frame.
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no era directories"):
        read_widened(spark, empty)


def test_python_datasource_parallel_paged_reads(spark):
    """The paged-API DataSource enumerates pages as input partitions and
    fetches each in executors; the union is deterministic."""
    from odl_etl_spark.io.api_source import PagedApiDataSource, fake_fetch_page

    spark.dataSource.register(PagedApiDataSource)
    df = (
        spark.read.format("paged_api")
        .option("pages", "3")
        .option("rows_per_page", "10")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one task per page
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(
        row for p in range(3) for row in fake_fetch_page(p, 10)
    )
    assert [g[:3] for g in got] == [w[:3] for w in want]
    assert all(abs(g[3] - w[3]) < 1e-12 for g, w in zip(got, want))
    with __import__("pytest").raises(Exception, match="unknown transport"):
        (
            spark.read.format("paged_api")
            .option("transport", "https")
            .load()
            .collect()
        )


def test_cached_count_runs_one_job_per_table(spark, sf_dir):
    """The overflow guards call cached_count inside query builds; it must
    hit Spark once per (sf_dir, table) and serve repeats from memory."""
    from odl_etl_spark.io import sources

    sources._COUNT_CACHE.clear()
    n1 = sources.cached_count(spark, sf_dir, "region")
    assert (sf_dir, "region") in sources._COUNT_CACHE
    # poison the cache: a second call must NOT recount
    sources._COUNT_CACHE[(sf_dir, "region")] = n1 + 41
    assert sources.cached_count(spark, sf_dir, "region") == n1 + 41
    sources._COUNT_CACHE.clear()
    assert sources.cached_count(spark, sf_dir, "region") == n1


def test_sink_dir_gc_prunes_only_stale_foreign_sessions(tmp_path):
    # ADVICE r13 #2: per-applicationId scratch dirs never self-overwrite,
    # so dead sessions accumulate full table copies. GC removes siblings
    # untouched >2 days; keeps the live session's dirs (any age) and any
    # recently-touched foreign dir (could be a live concurrent session).
    import os
    import time

    from odl_etl_spark.io import sinks

    root = tmp_path / "odl_etl_spark_sink"
    root.mkdir()
    old_foreign = root / "orders_app-dead"
    new_foreign = root / "orders_app-live"
    own_old = root / "orders_app-me"
    for d in (old_foreign, new_foreign, own_old):
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
    stale = time.time() - 3 * 24 * 3600
    os.utime(old_foreign, (stale, stale))
    os.utime(own_old, (stale, stale))

    sinks._SINK_GC_DONE = False
    sinks._gc_stale_sink_dirs(str(root), "app-me")
    assert not old_foreign.exists()
    assert new_foreign.exists()
    assert own_old.exists()

    # once-per-process: a second call is a no-op even for newly-stale dirs
    os.utime(new_foreign, (stale, stale))
    sinks._gc_stale_sink_dirs(str(root), "app-me")
    assert new_foreign.exists()
    sinks._SINK_GC_DONE = False


def test_sink_dir_gc_keeps_marker_cached_layout_alive(tmp_path):
    # ADVICE r14 #1: marker-cached layouts (scan_dpp_join) never rewrite
    # their dir, so a long-lived session's still-in-use layout looked
    # stale to a sibling's GC. Liveness is now newest-of(dir, sentinel):
    # a fresh _LAYOUT_COMPLETE keeps a stale-mtime dir alive; a layout
    # whose sentinel is ALSO past the horizon is genuinely dead and goes.
    import os
    import time

    from odl_etl_spark.io import sinks

    root = tmp_path / "odl_etl_spark_sink"
    root.mkdir()
    stale = time.time() - 3 * 24 * 3600
    live_layout = root / "orders_by_nation_app-longlived"
    dead_layout = root / "orders_by_nation_app-dead"
    for d in (live_layout, dead_layout):
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
        (d / "_LAYOUT_COMPLETE").write_bytes(b"")
        os.utime(d, (stale, stale))
    os.utime(dead_layout / "_LAYOUT_COMPLETE", (stale, stale))
    # live_layout's marker keeps its fresh (now) mtime — the touch
    # scan_dpp_join performs on every marker-reuse.

    sinks._SINK_GC_DONE = False
    sinks._gc_stale_sink_dirs(str(root), "app-me")
    assert live_layout.exists()
    assert not dead_layout.exists()
    sinks._SINK_GC_DONE = False


def test_dpp_marker_reuse_touches_sentinel(spark, sf_dir):
    # The other half of the ADVICE r14 #1 fix: re-building scan_dpp_join
    # over an existing layout must refresh the sentinel's mtime so the
    # GC's newest-of(dir, sentinel) liveness check sees the reuse.
    import os
    import time

    from odl_etl_spark.queries import registry

    fn = registry()["scan_dpp_join"].build
    fn(spark, sf_dir).collect()
    from odl_etl_spark.io.sinks import session_sink_dir
    import re

    out = session_sink_dir(
        spark, "orders_by_nation_" + re.sub(r"[^A-Za-z0-9.]+", "_", sf_dir)
    )
    marker = os.path.join(out, "_LAYOUT_COMPLETE")
    stale = time.time() - 3 * 24 * 3600
    os.utime(marker, (stale, stale))
    fn(spark, sf_dir)  # marker-reuse path; no collect needed
    assert os.stat(marker).st_mtime > stale + 24 * 3600


def test_xml_roundtrip_explicit_schema(spark, sf_dir, tmp_path):
    # Round-14: the fourth interchange format. Write a projection of
    # nation as XML (native Spark 4 xml source), re-read with an
    # explicit schema (no inference pass), and require a lossless
    # roundtrip — same contract as the csv/jsonl/orc roundtrip keys.
    from odl_etl_spark.io.sources import load_table, xml_source

    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out = str(tmp_path / "nation_xml")
    (
        n.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .save(out)
    )
    back = xml_source(
        spark,
        out,
        row_tag="nation",
        schema="n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT",
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, n.collect()))


def test_register_views_skips_absent_tables_and_drops_stale_views(spark, sf_dir, tmp_path):
    # Core-only probe dirs lack the text/embedding corpora; registration
    # must skip them (queries that never touch those tables run fine)
    # AND drop a view left by a previous sf_dir, which would otherwise
    # silently serve another scale's data.
    import shutil as _sh

    from odl_etl_spark.io.sources import register_views

    core = tmp_path / "core_only"
    core.mkdir()
    for t in ("region", "nation", "lineitem"):
        _sh.copy(os.path.join(sf_dir, f"{t}.parquet"), core / f"{t}.parquet")

    register_views(spark, sf_dir)  # full fixture: events view exists
    assert spark.catalog.tableExists("events")
    register_views(spark, str(core))
    assert spark.catalog.tableExists("lineitem")
    assert not spark.catalog.tableExists("events"), "stale cross-scale view survived"
    register_views(spark, sf_dir)  # restore for sibling tests
