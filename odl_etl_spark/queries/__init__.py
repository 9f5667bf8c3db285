"""Registry of declared operators (SURVEY.md §2B): name → QuerySpec.

Every spec is one driver-checkable query: the Spark builder and its DuckDB
oracle live side by side so column aliases can never drift apart.
"""

from __future__ import annotations

from odl_etl_spark.queries.base import QuerySpec


def registry() -> dict[str, QuerySpec]:
    # Imports are lazy so a syntax error in one module surfaces at call
    # time with a clean traceback, and pyspark isn't imported on package
    # import for tooling that only wants the names.
    from odl_etl_spark.queries import (
        aggs,
        compose,
        events,
        extras,
        graph,
        joins,
        ml,
        multimodal,
        quality,
        scalars,
        scans,
        setops,
        similarity,
        streaming,
        text,
        tpch,
        windows,
    )

    modules = [
        scans,
        scalars,
        joins,
        aggs,
        windows,
        setops,
        streaming,
        events,
        text,
        similarity,
        graph,
        multimodal,
        ml,
        quality,
        extras,
        # Appended last: round-5+ additive keys live in the registry
        # tail, outside (and after) the 50-key driver check window.
        tpch,
        compose,
    ]
    out: dict[str, QuerySpec] = {}
    for mod in modules:
        for s in mod.SPECS:
            if s.name in out:
                raise ValueError(f"duplicate query key: {s.name}")
            out[s.name] = s
    return {k: out[k] for k in _check_order(out)}


def _check_order(out: dict[str, QuerySpec]) -> list[str]:
    """Key order = driver check order. The driver's gate verifies exactly
    the first 50 registry keys per round, so ordering is the verification
    budget.

    Round-7 window (VERDICT.md r6, Next-round #1 — the scripted
    rotation, applied verbatim): the 24 r3-stale keys in registry
    order, then the 3 round-6 additions that have never had a driver
    CORRECTNESS row (`dedup_incremental`, `sim_ann_pq`,
    `dedup_span_rewrite` — all tri-scale selfcheck-green,
    SELFCHECK_r06*.json), then changed-plan `graph_pagerank` (round-6
    dead-join removal; changed-plan keys join the next window, the r5
    `basket_pairs`/`sink_upsert` precedent), then the 22 oldest
    r4-checked keys in registry order (`sink_partitioned` …
    `agg_groupby`, skipping `graph_pagerank` which is already pulled
    forward) — exactly 50. Keys whose plan changed THIS round and sit
    in the window were re-verified hash-green tri-scale before the
    rotation landed: `sim_ann_hyperplane` (recall raise: 8 planes +
    Hamming≤2 multi-probe) and `sim_ann_pq` (ADVICE r6: constant
    R_MAX shortlist cap replacing the unbounded fraction broadcast).
    After this window lands green, every registry key has a driver row
    and none is older than r4.

    Round-8 rotation plan (do NOT apply before the r7 driver run
    lands): the 26 remaining r4-checked keys in registry order
    (`agg_stats`, `agg_collect`, `agg_distinct`, `agg_rollup`,
    `agg_cube`, `agg_gsets`, `agg_having`, `win_rank`, `win_analytic`,
    `win_frame`, `win_ntile`, `win_cume`, `win_range_frame`,
    `sort_limit`, `topk_per_group`, `set_union`, `set_intersect`,
    `set_except`, `stream_tumbling`, `stream_sliding`,
    `stream_session`, `text_pack_sequences`, `emb_covariance`,
    `text_ngram_containment`, `events_rfm`, `orders_backlog`), then
    the 3 round-7 additions (never driver-checked: `sim_rerank_pipeline`,
    `dedup_stream_ingest`, `corpus_curation_funnel` — all tri-scale
    selfcheck-green, SELFCHECK_r07*.json), then `sim_maxsim` (plan
    changed in round 7: higher-order-function scorer replacing the
    unrolled dot products, re-verified hash-green tri-scale), then the
    oldest r5-checked keys in registry order to fill 50 (20 of the 50,
    starting `sink_orc_roundtrip`, `sink_upsert`, `sort_zorder`,
    `scalar_null`, `scalar_map`, …). Steady-state
    cadence (≈50 checked/round vs ≤5 added/round) keeps staleness ≤2
    rounds."""
    first = [
        # --- round-7 window (VERDICT r6 Next-round #1): the 24 r3-stale
        # keys in registry order ---
        "text_repetition",
        "dedup_decontaminate",
        "corpus_mix",
        "emb_quantize",
        "sim_ann_hyperplane",
        "multimodal_catalog",
        "multimodal_image_features",
        "multimodal_video_frames",
        "sql_tpch_q1",
        "sql_tpch_q5",
        "sql_tpch_q18",
        "quality_gopher",
        "corpus_filter_c4",
        "emb_norm_stats",
        "join_interval_overlap",
        "events_active_users",
        "agg_weighted",
        "win_mad_outlier",
        "text_ngram_profile",
        "agg_grouping_id",
        "text_entropy",
        "events_funnel_time",
        "emb_pq_codebook",
        "text_idf_stop",
        # --- the 3 round-6 additions with no driver row yet ---
        "dedup_incremental",
        "sim_ann_pq",
        "dedup_span_rewrite",
        # --- changed-plan in round 6 (dead join removed) ---
        "graph_pagerank",
        # --- oldest r4-checked keys, registry order, fill to 50 ---
        "sink_partitioned",
        "sql_tpch_q3",
        "project_hash_email",
        "filter_pred",
        "scalar_string",
        "scalar_date",
        "scalar_math",
        "scalar_json",
        "scalar_array",
        "udf_scalar_pandas",
        "join_inner_equi",
        "join_full",
        "subq_in",
        "subq_scalar",
        "join_broadcast",
        "join_left",
        "join_semi",
        "join_anti",
        "join_theta_range",
        "join_multiway",
        "join_asof",
        "agg_groupby",
    ]
    assert len(first) == 50, len(first)
    assert all(k in out for k in first), sorted(set(first) - set(out))
    return first + [k for k in out if k not in set(first)]
