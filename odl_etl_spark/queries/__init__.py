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

    Round-9 window (VERDICT.md r8, Next-round #1 — the pre-written
    rotation, applied verbatim): the 30 remaining r5-checked keys in
    registry order (`text_quality` … `basket_pairs`), then the 3
    round-8 additions that have never had a driver CORRECTNESS row
    (`sim_ann_hyperplane_probe`, `sim_ann_pq_probe`,
    `sim_ann_ivf_probe` — tri-scale selfcheck-green, SELFCHECK_r08*,
    and independently re-verified hash-green by the r8 judge), then
    the round-8 composed-builder-refactored keys `sim_ann_hyperplane`
    and `sim_ann_pq` (`sim_ann_ivf` already sits in the r5-stale set
    above; changed-plan keys join the next window, the `sim_maxsim`
    r8 precedent), then the 15 oldest r6-checked keys in registry
    order (`scan_parquet` … `agg_mode`) — exactly 50. After this
    window lands green, every registry key has a driver row and the
    oldest check is r6 (34 keys), meeting the ≤2-round staleness
    cadence at the next rotation.

    Round-10 rotation plan (do NOT apply before the r9 driver run
    lands): the 34 r6-checked keys that survive the round-9 window,
    in registry order (`unpivot_long`, `agg_corr`,
    `timeseries_gapfill`, `win_first_last`, `stream_cdc_apply`,
    `events_funnel`, `events_retention`, `events_transitions`,
    `events_sessionize`, `events_attribution`, `scd2_point_in_time`,
    `dedup_url`, `text_keywords`, `graph_triangles`, `sketch_bloom`,
    `sql_tpch_q10`, `sql_recursive_cte`, then `sql_tpch_q2`,
    `sql_tpch_q4`, `sql_tpch_q6` … `sql_tpch_q22` — the 17
    TPC-H/recursive keys), then the round-9 additions without a
    driver row (`ann_index_ingest_probe`, `stream_running_totals`),
    then the keys whose plan changed in round 9
    (`corpus_curation_funnel` — the materialize(base) cut;
    `dedup_near` — the LSH self-join shuffle_hash hint, which also
    re-plans `corpus_curation_funnel`'s near-dedup stage;
    `dedup_ngram_jaccard`, `dedup_cluster`, `dedup_simhash`,
    `dedup_embedding` — the same shuffle-not-broadcast hint applied
    to the postings/chunk/SRP-band self-joins), then the
    oldest r7-checked keys in registry order to fill 50. Steady-state
    cadence (≈50 checked/round vs ≤5 added/round) keeps staleness
    ≤2 rounds.

    Round-10 additive-key candidates (≤2, registry tail, in priority
    order): `dedup_cluster_incremental` — promote
    operators/components.connected_components_incremental +
    streaming/ingest_clusters (built and pinned in round 9) to an
    oracled key; DuckDB expresses the full-CC oracle via a recursive
    CTE (the sql_recursive_cte precedent), and incremental ≡ rebuild
    makes the same oracle serve both. Second: an
    `ingest_pq_probe`-style key for the PQ streaming loop
    (streaming/ingest_ann.ingest_pq_stream, round-9) if budget
    remains."""
    first = [
        # --- round-9 window (VERDICT r8 Next-round #1): the 30 r5-stale
        # keys in registry order ---
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
        "basket_pairs",
        # --- the 3 round-8 stored-index probe keys with no driver row ---
        "sim_ann_hyperplane_probe",
        "sim_ann_pq_probe",
        "sim_ann_ivf_probe",
        # --- round-8 composed-builder-refactored ANN keys (ivf above) ---
        "sim_ann_hyperplane",
        "sim_ann_pq",
        # --- oldest r6-checked keys, registry order, fill to 50 ---
        "scan_parquet",
        "scan_pruned",
        "sink_csv_roundtrip",
        "sink_jsonl_roundtrip",
        "udaf_regression",
        "explode_posexplode",
        "scalar_variant",
        "join_skew_salted",
        "join_bucketed",
        "join_fuzzy_match",
        "join_lateral_topk",
        "agg_sketch_partial",
        "agg_exact_median",
        "agg_histogram",
        "agg_mode",
    ]
    assert len(first) == 50, len(first)
    assert all(k in out for k in first), sorted(set(first) - set(out))
    return first + [k for k in out if k not in set(first)]
