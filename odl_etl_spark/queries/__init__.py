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
        # Appended last: round-5 additive keys live in the registry tail,
        # outside (and after) the 50-key driver check window.
        tpch,
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

    Round-6 window (VERDICT.md r5, Next-round #1): the 31 round-5
    additions that have never had a driver CORRECTNESS row (all
    tri-scale selfcheck-green, SELFCHECK_r05*.json), then the 19 oldest
    r3-checked keys in registry order — exactly 50. After this window
    lands green, every registry key has a driver row and none is older
    than r3. Two keys in the window changed plans THIS round, both
    advisor-prescribed (ADVICE r5): `scd2_point_in_time` (deterministic
    event_id tiebreak) and `sql_recursive_cte` (forked-session conf
    scoping); both re-verified hash-green against the oracle before the
    rotation was applied.

    Round-7 rotation plan (reaches zero-stale; do NOT apply before the
    r6 driver run lands): the 24 remaining r3-checked keys
    (`text_repetition`, `dedup_decontaminate`, `corpus_mix`,
    `emb_quantize`, `sim_ann_hyperplane` (plan+semantics changed in
    round 6: Hamming≤1 multi-probe, recall@10 0.0→0.4-0.6; tri-scale
    re-verified), `multimodal_catalog`,
    `multimodal_image_features`, `multimodal_video_frames`,
    `sql_tpch_q1`, `sql_tpch_q5`, `sql_tpch_q18`, `quality_gopher`,
    `corpus_filter_c4`, `emb_norm_stats`, `join_interval_overlap`,
    `events_active_users`, `agg_weighted`, `win_mad_outlier`,
    `text_ngram_profile`, `agg_grouping_id`, `text_entropy`,
    `events_funnel_time`, `emb_pq_codebook`, `text_idf_stop`), then the
    3 never-checked round-6 additions (`dedup_incremental`,
    `sim_ann_pq`, `dedup_span_rewrite` — all tri-scale selfcheck-green,
    SELFCHECK_r06*.json), then `graph_pagerank` (plan changed in round
    6 — the dead per-iteration nodes-LEFT-JOIN removed, PLANS.md
    candidate; changed-plan keys join the next window, the r5
    `basket_pairs`/`sink_upsert` precedent), then the oldest r4-checked
    keys in registry order to fill 50 (22 of the 49, starting
    `sink_partitioned`, `sql_tpch_q3`, `project_hash_email`, …). After
    round 7 no key lacks a driver row and none is older than r4; the
    steady-state cadence (≈50 checked/round vs ≤5 added/round) keeps
    staleness ≤2 rounds."""
    first = [
        # --- never driver-checked (31 round-5 additions, registry order) ---
        "scalar_variant",
        "join_fuzzy_match",
        "join_lateral_topk",
        "agg_corr",
        "win_first_last",
        "stream_cdc_apply",
        "scd2_point_in_time",
        "dedup_url",
        "text_keywords",
        "sim_maxsim",
        "graph_triangles",
        "sketch_bloom",
        "sql_tpch_q10",
        "sql_recursive_cte",
        "sql_tpch_q2",
        "sql_tpch_q4",
        "sql_tpch_q6",
        "sql_tpch_q7",
        "sql_tpch_q8",
        "sql_tpch_q9",
        "sql_tpch_q11",
        "sql_tpch_q12",
        "sql_tpch_q13",
        "sql_tpch_q14",
        "sql_tpch_q15",
        "sql_tpch_q16",
        "sql_tpch_q17",
        "sql_tpch_q19",
        "sql_tpch_q20",
        "sql_tpch_q21",
        "sql_tpch_q22",
        # --- oldest driver rows (r3), registry order, fill to 50 ---
        "scan_parquet",
        "scan_pruned",
        "sink_csv_roundtrip",
        "sink_jsonl_roundtrip",
        "udaf_regression",
        "explode_posexplode",
        "join_skew_salted",
        "join_bucketed",
        "agg_sketch_partial",
        "agg_exact_median",
        "agg_histogram",
        "agg_mode",
        "unpivot_long",
        "timeseries_gapfill",
        "events_funnel",
        "events_retention",
        "events_transitions",
        "events_sessionize",
        "events_attribution",
    ]
    assert len(first) == 50, len(first)
    assert all(k in out for k in first), sorted(set(first) - set(out))
    return first + [k for k in out if k not in set(first)]
