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
    budget. Round-5 priority (VERDICT.md r4, Next-round #1): the 48 keys
    whose latest driver CORRECTNESS row is from r1/r2 (oldest-first:
    `scalar_null` is the single r1-latest key; the other 47 were last
    checked r2 — the entire dedup/sim/text LLM tier among them), then
    `basket_pairs` (plan rewritten in r4 but outside the r4 window —
    ADVICE r4 low), then `sink_upsert` (staging reads schema-pinned this
    round — ADVICE r4 medium) — exactly 50. After this window lands green,
    no key's driver verification will be older than r3. Everything outside
    the window was driver-checked green in r3/r4 and is selfcheck-green at
    sf0.001, sf0.01 AND sf0.1 (SELFCHECK_r04*.json).

    Round-6 rotation note (do NOT apply before the r5 driver run lands):
    after CORRECTNESS_r05 covers this window, the highest-priority keys
    are the 26 round-5 additions with no driver row yet (sql_tpch_q2/q4/
    q6/q7/q8/q9/q11-q17/q19-q22, stream_cdc_apply, text_keywords,
    sketch_bloom, scd2_point_in_time, win_first_last, agg_corr,
    sql_recursive_cte, scalar_variant, join_lateral_topk — all
    tri-scale selfcheck-green, SELFCHECK_r05*.json), then the oldest
    r3-checked keys to fill 50."""
    first = [
        # --- last driver-checked round 1 ---
        "scalar_null",
        # --- last driver-checked round 2 (47 keys, registry order) ---
        "sink_orc_roundtrip",
        "sort_zorder",
        "scalar_map",
        "agg_pivot",
        "agg_approx_quantile",
        "agg_approx_distinct",
        "agg_decimal_exact",
        "stream_dedup",
        "stream_interval_join",
        "scd2_build",
        "timeseries_resample",
        "events_anomaly",
        "events_path_topk",
        "timeseries_ewma",
        "text_tokenize_tf",
        "text_ngrams",
        "text_lang_stats",
        "text_token_count",
        "text_quality",
        "text_langid",
        "text_fingerprint",
        "dedup_exact",
        "dedup_fingerprint",
        "dedup_ngram_jaccard",
        "dedup_near",
        "dedup_simhash",
        "dedup_cluster",
        "text_tfidf",
        "text_pii_scrub",
        "text_winnow_fp",
        "sample_stratified",
        "text_bpe_count",
        "corpus_filter",
        "text_chunk",
        "sim_topk",
        "sim_pairwise_label",
        "sim_ann_ivf",
        "emb_centroid_dist",
        "dedup_embedding",
        "sim_knn_join",
        "multimodal_audio_features",
        "emb_kmeans",
        "sketch_countmin",
        "text_bm25",
        "corpus_split",
        "text_unigram_ppl",
        "dedup_span_coverage",
        # --- plan rewritten in r4 outside the r4 window (ADVICE r4) ---
        "basket_pairs",
        # --- plan changed this round: staging reads schema-pinned ---
        "sink_upsert",
    ]
    assert len(first) == 50, len(first)
    assert all(k in out for k in first), sorted(set(first) - set(out))
    return first + [k for k in out if k not in set(first)]
