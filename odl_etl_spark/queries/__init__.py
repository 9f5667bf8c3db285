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
    budget. Round-3 priority (VERDICT.md r2, Next-round #1): the 27 keys
    that have never had a driver correctness row, then the one r2 FAIL
    (`emb_covariance`, determinism-fixed this round), then any keys new
    in round 3 — everything else is already driver-green on an unchanged
    spec and sits behind the window."""
    first = [
        # --- never driver-checked in r1/r2 (27 keys, all selfcheck-green) ---
        "sink_csv_roundtrip",
        "sink_jsonl_roundtrip",
        "sink_upsert",
        "explode_posexplode",
        "udaf_regression",
        "join_bucketed",
        "join_skew_salted",
        "agg_exact_median",
        "agg_histogram",
        "agg_mode",
        "agg_sketch_partial",
        "unpivot_long",
        "timeseries_gapfill",
        "events_attribution",
        "events_funnel",
        "events_retention",
        "events_sessionize",
        "events_transitions",
        "corpus_mix",
        "dedup_decontaminate",
        "text_repetition",
        "emb_quantize",
        "sim_ann_hyperplane",
        "graph_pagerank",
        "multimodal_catalog",
        "multimodal_image_features",
        "multimodal_video_frames",
        # --- r2 FAIL, spec re-derived with order-independent integer sums ---
        "emb_covariance",
        # --- new in round 3 — no correctness row yet (slots 29-50) ---
        "sql_tpch_q1",
        "sql_tpch_q5",
        "sql_tpch_q18",
        "quality_gopher",
        "corpus_filter_c4",
        "text_ngram_containment",
        "emb_norm_stats",
        "join_interval_overlap",
        "events_rfm",
        "basket_pairs",
        "events_active_users",
        "agg_weighted",
        "win_mad_outlier",
        "text_ngram_profile",
        "agg_grouping_id",
        "text_entropy",
        "events_funnel_time",
        "emb_pq_codebook",
        "text_idf_stop",
        "orders_backlog",
    ]
    assert all(k in out for k in first), sorted(set(first) - set(out))
    return first + [k for k in out if k not in set(first)]
