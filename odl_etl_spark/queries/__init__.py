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
    ]
    out: dict[str, QuerySpec] = {}
    for mod in modules:
        for s in mod.SPECS:
            if s.name in out:
                raise ValueError(f"duplicate query key: {s.name}")
            out[s.name] = s
    return {k: out[k] for k in _check_order(out)}


def _check_order(out: dict[str, QuerySpec]) -> list[str]:
    """Key order = driver check order. The round-1 gate verified exactly
    the first 50 registry keys, so keys still awaiting a correctness row
    (the whole text/dedup/similarity tier) and keys whose spec changed
    this round come first; the tail is keys already verified green on an
    unchanged spec in round 1."""
    first = [
        # newest keys — no correctness row yet
        "text_unigram_ppl",
        "dedup_span_coverage",
        "events_path_topk",
        "timeseries_ewma",
        "agg_decimal_exact",
        "sort_zorder",
        "emb_kmeans",
        "emb_covariance",
        "sketch_countmin",
        "text_bm25",
        "corpus_split",
        "text_chunk",
        "scd2_build",
        "timeseries_resample",
        "events_anomaly",
        "multimodal_audio_features",
        "sink_orc_roundtrip",
        # never oracle-checked by the driver (round 1 stopped at key 50)
        "stream_dedup",
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
        "sim_topk",
        "sim_pairwise_label",
        "sim_ann_ivf",
        "emb_centroid_dist",
        # spec changed this round — re-verification needed
        "scalar_map",
        "agg_pivot",
        "agg_approx_quantile",
        "agg_approx_distinct",
        "win_ntile",
        # new keys this round — no correctness row yet
        "dedup_embedding",
        "dedup_cluster",
        "text_tfidf",
        "sim_knn_join",
        "text_pii_scrub",
        "text_winnow_fp",
        "text_pack_sequences",
        "sample_stratified",
        "text_bpe_count",
        "corpus_filter",
        "stream_interval_join",
        "text_repetition",
        "dedup_decontaminate",
        "corpus_mix",
        "events_funnel",
        "events_retention",
        "events_transitions",
        "emb_quantize",
        "join_skew_salted",
        "agg_sketch_partial",
        "agg_exact_median",
        "join_bucketed",
        "sink_csv_roundtrip",
        "sink_jsonl_roundtrip",
        "sink_upsert",
        "udaf_regression",
        "graph_pagerank",
        "multimodal_catalog",
        "multimodal_image_features",
        "multimodal_video_frames",
        "events_sessionize",
        "events_attribution",
        "timeseries_gapfill",
        "agg_histogram",
        "agg_mode",
        "unpivot_long",
        "explode_posexplode",
        "sim_ann_hyperplane",
    ]
    assert all(k in out for k in first), sorted(set(first) - set(out))
    return first + [k for k in out if k not in set(first)]
