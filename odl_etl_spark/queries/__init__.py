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

    Round-10 window (VERDICT.md r9, Next-round #1 — the pre-written
    rotation, applied verbatim; window recomputed from the union of
    CORRECTNESS_r01–r09 latest-check rounds): the 34 r6-checked keys
    that survived the round-9 window, in registry order
    (`unpivot_long` … `sql_tpch_q22` — includes the 17
    TPC-H/recursive-CTE keys), then the round-9 additions with no
    driver CORRECTNESS row yet (`stream_running_totals`,
    `ann_index_ingest_probe` — both judge-verified hash-green in a
    plain session, VERDICT r9), then the 6 keys whose plan changed in
    round 9 (`corpus_curation_funnel` — the materialize(base) cut;
    `dedup_near` — the LSH self-join shuffle_hash re-plan;
    `dedup_ngram_jaccard`, `dedup_cluster`, `dedup_simhash`,
    `dedup_embedding` — the same shuffle-not-broadcast hint on their
    postings/chunk/SRP-band self-joins; `sim_ann_ivf`'s stamp
    projection was already refreshed in-window r9), then the 8
    oldest-r7 keys in registry order to fill exactly 50
    (`sink_partitioned` … `scalar_json`). After this window lands
    green, post-r10 staleness is ≤2 rounds for every key (oldest =
    the 40 remaining r7 keys + r8/r9/r10 cohorts).

    Round-11 rotation plan (do NOT apply before the r10 driver run
    lands): the 40 r7-checked keys that survive the round-10 window,
    in registry order (`sql_tpch_q1`, `project_hash_email`'s cohort
    minus the 8 refreshed here), then any round-10 additions without
    a driver row (`dedup_cluster_incremental` if promoted this
    round), then any keys whose plan changed in round 10 (candidates:
    `sim_ann_pq_probe` if the probe-path count fix touches the
    oracled key's plan), then oldest-r8 fill to exactly 50. Cadence
    (≈50 checked/round vs ≤5 added/round) keeps staleness ≤2 rounds.

    Round-11 additive-key candidates (≤2, registry tail): an
    `ingest_pq_probe`-style key for the PQ streaming loop
    (streaming/ingest_ann.ingest_pq_stream) if budget remains."""
    first = [
        # --- round-10 window (VERDICT r9 Next-round #1): the 34
        # r6-stale keys in registry order ---
        "unpivot_long",
        "agg_corr",
        "timeseries_gapfill",
        "win_first_last",
        "stream_cdc_apply",
        "events_funnel",
        "events_retention",
        "events_transitions",
        "events_sessionize",
        "events_attribution",
        "scd2_point_in_time",
        "dedup_url",
        "text_keywords",
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
        # --- round-9 additions: first driver CORRECTNESS rows ---
        "stream_running_totals",
        "ann_index_ingest_probe",
        # --- round-9 changed-plan keys (sim_maxsim r8 precedent) ---
        "corpus_curation_funnel",
        "dedup_near",
        "dedup_ngram_jaccard",
        "dedup_cluster",
        "dedup_simhash",
        "dedup_embedding",
        # --- oldest-r7 keys, registry order, fill to 50 ---
        "sink_partitioned",
        "sql_tpch_q3",
        "project_hash_email",
        "filter_pred",
        "scalar_string",
        "scalar_date",
        "scalar_math",
        "scalar_json",
    ]
    assert len(first) == 50, len(first)
    assert all(k in out for k in first), sorted(set(first) - set(out))
    return first + [k for k in out if k not in set(first)]
