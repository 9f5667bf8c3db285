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
    budget. Round-4 priority (VERDICT.md r3, Next-round #1 and #6): the
    r2/r3 red `emb_covariance` (output now integer-exact), then the seven
    keys whose plans changed this round (`sink_upsert` restaged,
    `graph_pagerank` checkpointed, `text_ngram_containment` moved to
    array_intersect, and the four consumers of the ranking
    boundary-consistency fix: `events_rfm`, `orders_backlog`,
    `text_pack_sequences`, `win_ntile`), then 42 of the keys last
    driver-checked in round 1 (the stale-green tail) — exactly 50.
    Everything outside the window is selfcheck-green at sf0.001, sf0.01
    AND sf0.1 (SELFCHECK_r04*.json); the remaining r1/r2-checked keys
    are the round-5 window."""
    first = [
        # --- red in r2+r3: hashed output is now raw BIGINT stats ---
        "emb_covariance",
        # --- plans changed in round 4, need a fresh driver row ---
        "sink_upsert",
        "graph_pagerank",
        "text_ngram_containment",
        "events_rfm",
        "orders_backlog",
        "text_pack_sequences",
        "win_ntile",
        # --- last driver-checked round 1 (42 keys, oldest first tier) ---
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
        "agg_stats",
        "agg_collect",
        "agg_distinct",
        "agg_rollup",
        "agg_cube",
        "agg_gsets",
        "agg_having",
        "win_rank",
        "win_analytic",
        "win_frame",
        "win_cume",
        "win_range_frame",
        "sort_limit",
        "topk_per_group",
        "set_union",
        "set_intersect",
        "set_except",
        "stream_tumbling",
        "stream_sliding",
        "stream_session",
    ]
    assert all(k in out for k in first), sorted(set(first) - set(out))
    return first + [k for k in out if k not in set(first)]
