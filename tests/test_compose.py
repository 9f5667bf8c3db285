"""Composition-key contracts (queries/compose.py, round 7).

Each composed pipeline must (a) keep the plan shape its component keys
pinned, and (b) be consistent with those components' outputs — the
stages really are the same operators, not lookalike reimplementations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from odl_etl_spark.plans import explain_str, shuffle_count
from odl_etl_spark.queries import registry


def build(name, spark, sf_dir):
    return registry()[name].build(spark, sf_dir)


def test_rerank_pipeline_is_pruned_scan_no_shuffle(spark, sf_dir):
    # LSH candidate filter + MaxSim HOF scorer fuse into ONE filtered
    # projection + TakeOrdered — the corpus never shuffles and the
    # candidate stage never materializes (same contract as sim_maxsim,
    # plus the bucket filter).
    df = build("sim_rerank_pipeline", spark, sf_dir)
    assert shuffle_count(df) == 0
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_rerank_pipeline_results_are_hyperplane_candidates(spark, sf_dir):
    # Every returned id must come from the shared candidate stage, and
    # its score must equal sim_maxsim's exact score for that id — the
    # composition reuses the components, bit for bit.
    from odl_etl_spark.queries.similarity import hyperplane_candidates

    got = {r.vec_id: r.maxsim for r in build("sim_rerank_pipeline", spark, sf_dir).collect()}
    cand, _ = hyperplane_candidates(spark, sf_dir, n_planes=5, radius=3)
    cand_ids = {r.vec_id for r in cand.select("vec_id").collect()}
    assert set(got) <= cand_ids
    full = {
        r.vec_id: r.maxsim
        for r in registry()["sim_maxsim"].build(spark, sf_dir).collect()
    }
    for vid, score in got.items():
        if vid in full:
            assert score == full[vid]


def test_stream_ingest_batches_partition_the_day(spark, sf_dir):
    rows = build("dedup_stream_ingest", spark, sf_dir).collect()
    assert rows, "fixture must contain cross-batch near-duplicates"
    src1 = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("source") == "src1")
        .select("doc_id")
        .collect()
    }
    for r in rows:
        # new side is always the day's batch, with its scripted arrival slot
        assert r.new_id in src1
        assert r.batch == r.new_id % 3 + 1
        # the matched index entry was committed strictly earlier
        ex_batch = r.ex_id % 3 + 1 if r.ex_id in src1 else 0
        assert ex_batch < r.batch


def test_stream_ingest_agrees_with_one_shot_incremental(spark, sf_dir):
    # Restricted to (src1 x corpus) pairs, the micro-batched replay must
    # emit exactly dedup_incremental's one-shot probe result — batching
    # changes WHEN a pair is found, never WHETHER.
    inc = {
        (r.new_id, r.ex_id, r.jaccard)
        for r in registry()["dedup_incremental"].build(spark, sf_dir).collect()
    }
    stream = build("dedup_stream_ingest", spark, sf_dir)
    src1 = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("source") == "src1"
    ).select(F.col("doc_id").alias("ex_id"))
    cross = {
        (r.new_id, r.ex_id, r.jaccard)
        for r in stream.join(src1, "ex_id", "anti").collect()
    }
    assert cross == inc


def test_curation_funnel_key_matches_pipeline(spark, sf_dir, tmp_path):
    # The query key (out_path=None) and the writing pipeline must emit
    # the identical attrition table, and the funnel must partition the
    # non-held-out corpus exactly.
    from odl_etl_spark.pipelines.curation import curate_corpus

    key = {(r.stage, r.n_docs) for r in build("corpus_curation_funnel", spark, sf_dir).collect()}
    _, funnel = curate_corpus(spark, sf_dir, str(tmp_path / "curated"))
    assert {(r.stage, r.n_docs) for r in funnel.collect()} == key
    total = sum(n for _, n in key)
    n_corpus = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("source") != "src0")
        .count()
    )
    assert total == n_corpus
    assert {s for s, _ in key} <= {
        "quality", "language", "exact_dup", "near_dup", "contaminated", "kept"
    }


def test_curation_funnel_no_cartesian_all_joins_hashed(spark, sf_dir):
    # The funnel's accounting joins (exact/near/kept id flags) and the
    # decontamination semi-join must plan as (broadcast) hash joins —
    # never a cartesian or nested-loop fallback. With the materialize()
    # lineage cuts upstream, the final plan is the accounting segment.
    df = build("corpus_curation_funnel", spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_era_split_partitions_nulls_to_era2(spark):
    # ADVICE r13 #1: `~(col < cut)` silently dropped NULL orderdates
    # from BOTH eras. era_split must be an exact partition — every row
    # in exactly one era — with NULLs in era 2, matching the oracle's
    # CASE WHEN date < cut THEN 1 ELSE 2.
    import datetime

    from odl_etl_spark.queries.compose import era_split

    rows = [
        (1, datetime.datetime(1995, 6, 1)),
        (2, datetime.datetime(1996, 6, 1)),
        (3, None),
        (4, datetime.datetime(1996, 1, 1)),  # boundary: >= cut -> era 2
    ]
    o = spark.createDataFrame(rows, "o_orderkey int, o_orderdate timestamp")
    cut = F.lit("1996-01-01").cast("timestamp")
    era1, era2 = era_split(o, cut)
    k1 = {r.o_orderkey for r in era1.collect()}
    k2 = {r.o_orderkey for r in era2.collect()}
    assert k1 == {1}
    assert k2 == {2, 3, 4}
    assert k1 | k2 == {1, 2, 3, 4} and not (k1 & k2)


def test_dpp_layout_is_keyed_by_scale(spark):
    # The cached fact layout (_LAYOUT_COMPLETE marker) must be keyed by
    # sf_dir: one session builds this key at several scales (selfcheck
    # sweeps, scale probes), and reusing another scale's fact would
    # silently return that scale's answer.
    import os

    import pytest

    from odl_etl_spark.queries import registry
    from tests.conftest import SF_DIR

    # Derive both scales from the conftest fixture root (ADVICE r14 #3 —
    # no absolute literals; honors ODL_TEST_SF_DIR relocation). Skip
    # rather than fail when the sibling scale isn't materialized.
    root = os.path.dirname(SF_DIR.rstrip("/"))
    small, large = os.path.join(root, "sf0.001"), os.path.join(root, "sf0.01")
    if not (os.path.isdir(small) and os.path.isdir(large)):
        pytest.skip("needs both sf0.001 and sf0.01 fixture dirs")
    fn = registry()["scan_dpp_join"].build
    n1 = sum(r["n"] for r in fn(spark, small).collect())
    n2 = sum(r["n"] for r in fn(spark, large).collect())
    assert n1 != n2
