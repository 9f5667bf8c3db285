"""Plan-shape contracts: the 100 TB posture, pinned by CI.

Each test asserts a physical-plan property that matters at scale and
would silently regress otherwise (pushdown reaching the scan, dims
broadcasting, map-side partial aggregation, take-ordered instead of a
global sort, shuffle counts).
"""

from __future__ import annotations

import re

from odl_etl_spark.plans import (
    explain_str,
    has_broadcast_join,
    has_partial_aggregate,
    has_pushed_filters,
    pruned_columns,
    shuffle_count,
)
from odl_etl_spark.queries import registry


def build(name, spark, sf_dir):
    return registry()[name].build(spark, sf_dir)


def test_scan_pruned_pushes_filters_and_prunes_columns(spark, sf_dir):
    df = build("scan_pruned", spark, sf_dir)
    assert has_pushed_filters(df, "IsNotNull(l_quantity)", "LessThan(l_quantity,25.0)")
    cols = pruned_columns(df)
    # Only the projected + filtered columns leave the reader — 11-col table.
    assert cols == {
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_quantity",
        "l_shipdate",
    }


def test_flagship_reads_only_two_columns(spark, sf_dir):
    df = build("project_hash_email", spark, sf_dir)
    assert pruned_columns(df) == {"c_custkey", "c_name"}


def test_broadcast_joins_broadcast(spark, sf_dir):
    for name in ["join_broadcast", "join_multiway", "topk_per_group"]:
        assert has_broadcast_join(build(name, spark, sf_dir)), name


def test_agg_partial_combines(spark, sf_dir):
    for name in ["agg_groupby", "join_broadcast", "stream_tumbling"]:
        assert has_partial_aggregate(build(name, spark, sf_dir)), name


def test_sort_limit_is_take_ordered(spark, sf_dir):
    df = build("sort_limit", spark, sf_dir)
    assert "TakeOrderedAndProject" in explain_str(df)
    assert shuffle_count(df) == 0  # no global sort exchange


def test_asof_join_single_shuffle(spark, sf_dir):
    # The union+carry as-of join must cost exactly one hash exchange (the
    # window partitioning) — the property that beats a range join at scale.
    df = build("join_asof", spark, sf_dir)
    assert shuffle_count(df) == 1


def test_agg_groupby_single_shuffle(spark, sf_dir):
    assert shuffle_count(build("agg_groupby", spark, sf_dir)) == 1


def test_ntile_has_no_unpartitioned_window_over_input(spark, sf_dir):
    # The global order must come from a distributed range shuffle
    # (pinned on the pre-checkpoint stage — the boundary-consistency
    # localCheckpoint hides it from the final plan), and the row_number
    # window must be partitioned (by _pid). The only permitted
    # unpartitioned window is the offset cumsum over the
    # O(#partitions)-row count table (its spec orders by _pid and
    # aggregates _c). The final plan must read the checkpoint
    # (ExistingRDD): both rank branches observing ONE materialized
    # partitioning is the correctness fix for sampled range boundaries.
    import re

    plan = explain_str(build("win_ntile", spark, sf_dir))
    assert "existingrdd" in plan.lower()
    specs = re.findall(r"Arguments: \[(\w+\(\S*\)) windowspecdefinition\(([^,]+)", plan)
    assert specs, "no window specs found"
    for fn, first_arg in specs:
        if fn.startswith("row_number"):
            assert first_arg.startswith("_pid"), f"row_number not partitioned: {first_arg}"
        else:
            assert fn.startswith("sum(_c"), f"unexpected unpartitioned window: {fn}"


def test_ranking_stage_is_a_range_shuffle(spark, sf_dir):
    # The materialized step-1 stage of the two-level rank must be a
    # distributed rangepartitioning exchange, never a single-partition
    # sort — asserted pre-checkpoint via the factored builder.
    from pyspark.sql import functions as _F

    from odl_etl_spark.io.sources import load_table
    from odl_etl_spark.operators.ranking import _range_partitioned

    df = load_table(spark, sf_dir, "orders").select(
        _F.col("o_custkey").alias("k"), "o_totalprice"
    )
    plan = explain_str(_range_partitioned(df, ["o_totalprice", "k"], 8))
    assert "rangepartitioning" in plan
    assert "SinglePartition" not in plan


def test_pairwise_label_has_zero_joins(spark, sf_dir):
    # The normalized-sum identity removes the O(n²)-per-label self-join:
    # the plan is explode + two hash aggregations, nothing else.
    plan = explain_str(build("sim_pairwise_label", spark, sf_dir))
    assert "Join" not in plan
    assert shuffle_count(build("sim_pairwise_label", spark, sf_dir)) == 2


def test_centroid_dist_broadcasts_centroids(spark, sf_dir):
    df = build("emb_centroid_dist", spark, sf_dir)
    assert has_broadcast_join(df)


def test_ivf_search_is_pruned_scan_no_shuffle(spark, sf_dir):
    # nprobe cell pruning turns ANN search into filter + TakeOrdered over
    # the probed cells only — no exchange of the corpus.
    df = build("sim_ann_ivf", spark, sf_dir)
    assert shuffle_count(df) == 0
    assert "TakeOrderedAndProject" in explain_str(df)


def test_knn_join_broadcasts_probes_and_truncates_locally(spark, sf_dir):
    # Probes broadcast (corpus never shuffles for the cross product), and
    # Catalyst's WindowGroupLimit rewrite runs in Partial mode before the
    # probe-keyed exchange — only #partitions·k rows reach the final
    # per-probe rank. A regression here funnels N·P rows through
    # #probes reducers.
    df = build("sim_knn_join", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert re.search(r"WindowGroupLimit .*row_number\(\), 5, Partial", plan)


def test_decontaminate_broadcasts_benchmark_set(spark, sf_dir):
    # The held-out shingle set must broadcast; the training corpus side
    # streams through a BroadcastHashJoin with no corpus shuffle before
    # the per-doc count aggregation.
    df = build("dedup_decontaminate", spark, sf_dir)
    assert has_broadcast_join(df)


def test_emb_quantize_is_shuffle_free(spark, sf_dir):
    # Quantization is row-local expression math: zero exchanges.
    df = build("emb_quantize", spark, sf_dir)
    assert shuffle_count(df) == 0
    assert "Join" not in explain_str(df)


def test_transitions_lag_window_is_user_partitioned(spark, sf_dir):
    # The input-sized lag window must be partitioned by user_id; the only
    # unpartitioned-ish window is the normalizer over the tiny transition
    # aggregate (partitioned by from_type).
    plan = explain_str(build("events_transitions", spark, sf_dir))
    specs = re.findall(r"\[(\w+\(\S*\)?) windowspecdefinition\(([^,]+)", plan)
    assert specs, "no window specs found"
    for fn, first_arg in specs:
        if fn.startswith("lag"):
            assert first_arg.startswith("user_id"), (fn, first_arg)


def test_salted_join_output_matches_plain_join(spark, sf_dir):
    # The salt must be internal-only: aggregate output equals the plain
    # join's (also enforced by the DuckDB oracle, asserted here so a
    # salting regression fails fast in CI without the oracle harness).
    from pyspark.sql import functions as F

    from odl_etl_spark.io.sources import load_table

    salted = build("join_skew_salted", spark, sf_dir)
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    plain = (
        l.join(s, l["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_items"))
    )
    got = {r["s_nationkey"]: r["n_items"] for r in salted.collect()}
    want = {r["s_nationkey"]: r["n_items"] for r in plain.collect()}
    assert got == want


def test_bucketed_join_has_no_join_shuffle(spark, sf_dir):
    # Both sides bucketed by the join key: with broadcast disabled (so
    # the fact⋈fact sort-merge path is exercised, as it would be at
    # 100 TB) the ONLY exchange in the plan is the final status agg —
    # the join itself reads co-located buckets.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = build("join_bucketed", spark, sf_dir)
        plan = explain_str(df)
        assert "SortMergeJoin" in plan
        assert shuffle_count(df) == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pagerank_is_integer_exact_and_repeatable(spark, sf_dir):
    # Fixed-point ranks must be BIGINT and identical across runs and
    # partitionings — the property float PageRank cannot give.
    df = build("graph_pagerank", spark, sf_dir)
    assert dict(df.dtypes)["rank"] == "bigint"
    a = [tuple(r) for r in df.collect()]
    b = [tuple(r) for r in build("graph_pagerank", spark, sf_dir).collect()]
    assert a == b
    # ranks sum to ~SCALE over the FULL node set is quantized below it;
    # top-20 ranks are strictly positive and sorted.
    ranks = [r for _, r in a]
    assert ranks == sorted(ranks, reverse=True) and ranks[-1] > 0


def test_pagerank_final_plan_is_checkpoint_backed(spark, sf_dir):
    # The iteration localCheckpoints edges, degrees, edge⋈degree, and the
    # per-round rank table (operators/pagerank.py), so the final top-20
    # action must read ONLY the last checkpoint: zero source scans in the
    # plan (the r3 regression re-executed the distinct-symmetrize
    # pipeline once per join — O(iterations) redundant lineitem scans).
    plan = explain_str(build("graph_pagerank", spark, sf_dir)).lower()
    assert "lineitem" not in plan
    assert "existingrdd" in plan  # checkpoint scan is the only source


def test_pack_sequences_cumsum_is_distributed(spark, sf_dir):
    # The only unpartitioned window allowed is the one over the
    # O(#partitions)-row offset table (orders by _pid, sums _c); the
    # input-sized running sum must be partitioned by _pid over the
    # materialized range stage (ExistingRDD) — same contract as
    # win_ntile.
    plan = explain_str(build("text_pack_sequences", spark, sf_dir))
    assert "existingrdd" in plan.lower()
    specs = re.findall(r"\[(\w+\(\S*\)) windowspecdefinition\(([^,]+)", plan)
    assert specs, "no window specs found"
    for fn, first_arg in specs:
        assert first_arg.startswith("_pid") or fn.startswith("sum(_c"), (fn, first_arg)


def test_maxsim_is_codegen_scan_no_shuffle(spark, sf_dir):
    # Late-interaction MaxSim is one nested higher-order expression
    # (aggregate/array_max/transform over the literal probe array) in a
    # single projection + TakeOrdered: zero exchanges, no join — the
    # corpus never shuffles (same contract as sim_topk).
    df = build("sim_maxsim", spark, sf_dir)
    assert shuffle_count(df) == 0
    assert "TakeOrderedAndProject" in explain_str(df)
    assert "Join" not in explain_str(df)


def test_dedup_url_is_single_keyed_agg(spark, sf_dir):
    # URL canonicalization is chained regexp expressions; the only
    # exchange is the canonical-key hash agg (map-side combined).
    df = build("dedup_url", spark, sf_dir)
    assert shuffle_count(df) == 1
    plan = explain_str(df)
    assert "partial_count" in plan or "partial_" in plan


def test_fuzzy_match_rides_equi_join_not_all_pairs(spark, sf_dir):
    # The levenshtein predicate must be a post-join filter on a blocked
    # EQUI-join over the distinct vocabulary — never a cartesian/NLJ
    # over names (and never over fact rows at all).
    df = build("join_fuzzy_match", spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_ann_hyperplane_is_pruned_scan_no_shuffle(spark, sf_dir):
    # The 5 signature dots are codegen'd expressions and the bucket
    # filter prunes before ranking: filter + TakeOrdered, zero exchanges
    # of the corpus (same contract as the IVF path).
    df = build("sim_ann_hyperplane", spark, sf_dir)
    assert shuffle_count(df) == 0
    assert "TakeOrderedAndProject" in explain_str(df)


def test_sessionize_windows_are_user_partitioned(spark, sf_dir):
    # Every window in the gaps-and-islands chain is partitioned by
    # user_id — no global sort exists at any scale.
    plan = explain_str(build("events_sessionize", spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\(([^,]+)", plan)
    assert specs, "no window specs found"
    for first_arg in specs:
        assert first_arg.startswith("user_id"), f"unpartitioned window: {first_arg}"


def test_gapfill_window_is_series_partitioned(spark, sf_dir):
    # The forward-fill window is partitioned per series (status); its
    # length is the calendar span, not the fact row count.
    plan = explain_str(build("timeseries_gapfill", spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\(([^,]+)", plan)
    assert specs, "no window specs found"
    for first_arg in specs:
        assert first_arg.startswith("status"), f"unpartitioned window: {first_arg}"


def test_mode_window_runs_over_compressed_aggregate(spark, sf_dir):
    # The rank window's input is the count table (partial+final agg
    # before the window), never the raw input.
    df = build("agg_mode", spark, sf_dir)
    plan = explain_str(df)
    assert has_partial_aggregate(df)
    assert plan.index("partial_count") < plan.index("windowspecdefinition")


def test_emb_covariance_never_joins_the_corpus(spark, sf_dir):
    # The Gram matrix comes from per-row generator products reduced by
    # the (i,j)-keyed agg — the corpus must never self-join on vec_id.
    # The only joins are the two d-row dimension-sum broadcasts.
    df = build("emb_covariance", spark, sf_dir)
    plan = explain_str(df)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert has_broadcast_join(df)
    assert has_partial_aggregate(df)
    assert "vec_id" not in plan  # pairs are emitted row-local, keyed only by (i,j)


def test_sketch_countmin_is_mergeable_partials(spark, sf_dir):
    # Bucket counts must partial-combine map-side (the mergeability the
    # sketch exists for); heavy-hitter cut is TakeOrdered, no global sort.
    df = build("sketch_countmin", spark, sf_dir)
    plan = explain_str(df)
    assert has_partial_aggregate(df)
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    # r17: ONE corpus pass. Everything downstream of the vocabulary
    # materialize reads the cut (ExistingRDD) — the sketch rows and the
    # candidate cut must never re-scan/re-tokenize the corpus (the old
    # shape was 5 logical scans / 10 in the physical plan).
    assert "existingrdd" in plan.lower()
    assert "Scan parquet" not in plan


def test_bm25_joins_are_broadcast_postings(spark, sf_dir):
    # Corpus stats (N, avgdl, per-term df) are parameter-sized and must
    # broadcast into the postings join; the ranked cut is TakeOrdered.
    df = build("text_bm25", spark, sf_dir)
    plan = explain_str(df)
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_rfm_ntiles_are_distributed(spark, sf_dir):
    # All three NTILE(5) scores must use the two-level rank: the final
    # plan reads the materialized range stage (ExistingRDD) with a
    # _pid-partitioned row_number; the only unpartitioned windows run
    # over the O(#partitions)-row offset tables.
    plan = explain_str(build("events_rfm", spark, sf_dir))
    assert "existingrdd" in plan.lower()
    specs = re.findall(r"Arguments: \[(\w+\(\S*\)) windowspecdefinition\(([^,]+)", plan)
    assert specs, "no window specs found"
    for fn, first_arg in specs:
        if fn.startswith("row_number"):
            assert first_arg.startswith("_pid"), (fn, first_arg)
        else:
            assert fn.startswith("sum(_c"), f"unexpected unpartitioned window: {fn}"


def test_backlog_cumsum_is_distributed(spark, sf_dir):
    # Running totals go through global_cumsum's materialized range stage
    # (ExistingRDD scan + _pid-partitioned running sums), not an
    # unpartitioned running-sum window over the day table.
    plan = explain_str(build("orders_backlog", spark, sf_dir))
    assert "existingrdd" in plan.lower()
    specs = re.findall(r"Arguments: \[(\w+\(\S*\)) windowspecdefinition\(([^,]+)", plan)
    assert specs, "no window specs found"
    for fn, first_arg in specs:
        assert first_arg.startswith("_pid") or fn.startswith("sum(_c"), (fn, first_arg)


def test_tpch_q5_broadcasts_dims(spark, sf_dir):
    # The star-join dims must broadcast; the agg partial-combines.
    df = build("sql_tpch_q5", spark, sf_dir)
    assert has_broadcast_join(df)
    assert has_partial_aggregate(df)


def test_basket_pairs_broadcasts_part_dim(spark, sf_dir):
    df = build("basket_pairs", spark, sf_dir)
    plan = explain_str(df)
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in plan


def test_basket_pairs_has_no_self_join(spark, sf_dir):
    # Pairs come from a per-order collect_set + expression generator:
    # exactly one non-broadcast join (the part dim) and two hash
    # exchanges (per-order agg, per-pair agg) — the a-priori self-join
    # shape would show a second fact join and a third exchange.
    df = build("basket_pairs", spark, sf_dir)
    plan = explain_str(df)
    assert plan.count("SortMergeJoin") == 0
    assert shuffle_count(df) == 2


def test_ngram_containment_joins_from_materialized_shingles(spark, sf_dir):
    # Both join sides must read the localCheckpoint'ed shingle table —
    # a plan that re-derives shingles from the parquet scan is the
    # triple-computation regression (split/transform/distinct per side
    # plus once more in the pushed-down size()>0 predicate).
    plan = explain_str(build("text_ngram_containment", spark, sf_dir)).lower()
    assert "documents" not in plan
    assert "existingrdd" in plan


def test_exact_median_guard_rejects_unbounded_keys(spark, sf_dir):
    import pytest as _pytest

    from odl_etl_spark.io.sources import load_table
    from odl_etl_spark.queries.aggs import guard_bounded_groups

    l = load_table(spark, sf_dir, "lineitem")
    guard_bounded_groups(l, "l_returnflag")  # 3 groups: fine
    with _pytest.raises(ValueError, match="agg_approx_quantile"):
        guard_bounded_groups(l, "l_orderkey", bound=100)


# --- TPC-H completion family (queries/tpch.py) -------------------------


def test_tpch_q6_all_predicates_pushed_no_join(spark, sf_dir):
    # The purest pushdown test: every range predicate must reach the
    # parquet reader and the plan must contain no join at all — a global
    # partial/final sum is the only aggregation.
    df = build("sql_tpch_q6", spark, sf_dir)
    assert has_pushed_filters(
        df,
        "GreaterThanOrEqual(l_shipdate,1996-01-01",
        "LessThan(l_shipdate,1997-01-01",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    )
    plan = explain_str(df)
    assert "Join" not in plan
    assert has_partial_aggregate(df)
    assert shuffle_count(df) == 0  # single-group agg: singlepartition only


def test_tpch_q19_or_predicate_stays_hash_join(spark, sf_dir):
    # The disjunction-of-conjunctions must NOT degrade the join: Catalyst
    # factors the common p_partkey equi-key out of the OR (hash join, part
    # broadcast) and derives single-side OR filters pushed to BOTH scans.
    df = build("sql_tpch_q19", spark, sf_dir)
    plan = explain_str(df)
    assert has_broadcast_join(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    pushed = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    or_sides = [p for p in pushed if "Or(Or(And(" in p]
    assert len(or_sides) == 2, pushed  # one derived OR filter per scan
    assert shuffle_count(df) == 0


def test_tpch_q21_exists_chains_decorrelate_to_hash_joins(spark, sf_dir):
    # The correlated EXISTS / NOT EXISTS with <>-predicates must
    # decorrelate into equi-keyed semi/anti joins — never a nested-loop
    # or cartesian evaluation of the subqueries per outer row.
    df = build("sql_tpch_q21", spark, sf_dir)
    plan = explain_str(df)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q16_not_in_is_anti_join(spark, sf_dir):
    # NOT IN over the supplier exclusion compiles to a (null-aware) anti
    # join; the COUNT(DISTINCT) plans the two-phase distinct aggregate.
    df = build("sql_tpch_q16", spark, sf_dir)
    plan = explain_str(df)
    assert "LeftAnti" in plan
    assert has_partial_aggregate(df)


def test_tpch_q17_correlated_avg_decorrelates(spark, sf_dir):
    # The per-part scalar AVG subquery must run as ONE partkey-keyed
    # aggregate joined back to the fact — not a re-scan per outer row.
    # One hash exchange (the decorrelated agg) is the whole shuffle cost.
    df = build("sql_tpch_q17", spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("avg(") >= 1
    assert shuffle_count(df) == 1


def test_tpch_q8_star_dims_broadcast(spark, sf_dir):
    # The 8-way star: every dim broadcasts; the year agg partial-combines.
    df = build("sql_tpch_q8", spark, sf_dir)
    assert has_broadcast_join(df)
    assert has_partial_aggregate(df)


def test_cdc_apply_single_shuffle_with_group_limit(spark, sf_dir):
    # Latest-write-wins must ride ONE keyed exchange, with the rn=1
    # predicate pushed into partial per-partition top-1 (WindowGroupLimit
    # Partial) so each task forwards one candidate row per key.
    df = build("stream_cdc_apply", spark, sf_dir)
    plan = explain_str(df)
    assert shuffle_count(df) == 1
    assert "WindowGroupLimit" in plan
    assert re.search(r"WindowGroupLimit.*Partial", plan, re.DOTALL)


def test_text_keywords_broadcasts_df_and_limits_window(spark, sf_dir):
    # The vocabulary-sized df table must broadcast into the (doc, term)
    # side, and the per-doc top-3 must plan as WindowGroupLimit.
    df = build("text_keywords", spark, sf_dir)
    assert has_broadcast_join(df)
    assert "WindowGroupLimit" in explain_str(df)


def test_sketch_bloom_broadcasts_bitmap(spark, sf_dir):
    # The m/32-row bitmap must broadcast into the probe side — the probe
    # never shuffles on the bitmap key — and the bitmap build must
    # partial-combine its bit_or.
    df = build("sketch_bloom", spark, sf_dir)
    plan = explain_str(df)
    assert has_broadcast_join(df)
    assert "partial_bit_or" in plan


def test_scd2_pit_rides_asof_not_theta_join(spark, sf_dir):
    # The temporal containment join must ride the union+carry as-of plan:
    # no nested-loop/cartesian interval join, and every exchange keyed
    # (the SCD2 window + the asof carry window — both on user_id).
    df = build("scd2_point_in_time", spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert shuffle_count(df) <= 2


def test_win_first_last_single_shuffle(spark, sf_dir):
    # first/last/nth share one window spec: one user-keyed exchange.
    assert shuffle_count(build("win_first_last", spark, sf_dir)) == 1


def test_agg_corr_single_partial_combined_exchange(spark, sf_dir):
    # Sufficient statistics accumulate map-side: one exchange carrying
    # 5 counters per group.
    df = build("agg_corr", spark, sf_dir)
    assert shuffle_count(df) == 1
    assert has_partial_aggregate(df)


def test_runtime_bloom_filter_prunes_shuffle_join_fact_side(spark, sf_dir):
    # The session posture enables runtime bloom-filter join pruning. At
    # fixture scale every dim broadcasts (already pruning), so force the
    # 100 TB condition — a shuffle join with a selective creation side —
    # and pin that Spark injects the bloom_filter_agg semi-filter on the
    # fact side. Plan-build only; confs restored afterward.
    from odl_etl_spark.io.sources import load_table

    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_thr = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        import pyspark.sql.functions as F

        l = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("l_returnflag").count()
        assert "bloom_filter_agg" in explain_str(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_thr,
        )


def test_lateral_topk_decorrelates_to_window_group_limit(spark, sf_dir):
    # The correlated LATERAL + LIMIT must become a keyed WindowGroupLimit
    # plan, never per-outer-row re-execution or a nested-loop join.
    df = build("join_lateral_topk", spark, sf_dir)
    plan = explain_str(df)
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sim_ann_pq_searches_codes_not_floats(spark, sf_dir):
    # PQ/ADC search: centroids and the 128-entry probe LUT are parameter
    # data and must BROADCAST to meet the corpus; the final top-k is a
    # TakeOrdered, never a global sort; nothing nested-loops the corpus.
    df = build("sim_ann_pq", spark, sf_dir)
    plan = explain_str(df)
    assert plan.count("BroadcastHashJoin") >= 2  # encode join + LUT join
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert has_partial_aggregate(df)


def test_dedup_span_rewrite_antijoin_no_quadratics(spark, sf_dir):
    # Span rewrite: removed positions are subtracted via an ANTI join
    # (AQE picks build side), first-occurrence selection is one keyed
    # window on the span hash, and no plan node is quadratic.
    df = build("dedup_span_rewrite", spark, sf_dir)
    plan = explain_str(df)
    assert "LeftAnti" in plan
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert has_partial_aggregate(df)


def test_hyperplane_index_bucket_layout_partition_prunes(spark, sf_dir, tmp_path):
    """The stored-index docstring claims that partitioning the
    hyperplane index BY bucket turns the Hamming-radius probe filter
    into partition pruning. Pin it: on a bucket-partitioned parquet
    index, bit_count(bucket XOR probe) <= r must appear under
    PartitionFilters (evaluated against directory values — only the
    sum(C(n_planes, r)) matching partitions are read), with no residual
    DataFilters on the row scan."""
    import pyspark.sql.functions as F

    from odl_etl_spark.io.sources import load_table
    from odl_etl_spark.operators.ann_index import hyperplane_index
    from odl_etl_spark.queries.similarity import hyperplane_params

    e = load_table(spark, sf_dir, "embeddings")
    hps, _, pb = hyperplane_params(spark, sf_dir, 5)
    d = str(tmp_path / "idx")
    hyperplane_index(e.where(F.col("vec_id") != 0), hps).write.partitionBy(
        "bucket"
    ).parquet(d)
    flt = spark.read.parquet(d).where(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(pb))) <= 2
    )
    plan = flt._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
    assert scan_lines, plan
    assert "bit_count" in scan_lines[0].split("PartitionFilters:")[1].split(
        "PushedFilters:"
    )[0], scan_lines[0]
    assert "DataFilters: []" in scan_lines[0], scan_lines[0]
    # And the pruned read returns exactly the Hamming ball's buckets.
    got_buckets = {
        r["bucket"] for r in flt.select("bucket").distinct().collect()
    }
    want = {b for b in range(32) if bin(b ^ pb).count("1") <= 2}
    assert got_buckets <= want


def test_ivf_index_cell_layout_partition_prunes(spark, sf_dir, tmp_path):
    """Same pin as the hyperplane layout test, for IVF: against a
    cell_id-partitioned stored assignment table, the probe's
    cell_id IN (...) filter must be partition pruning (PartitionFilters,
    no residual DataFilters on cell_id)."""
    import pyspark.sql.functions as F

    from odl_etl_spark.io.sources import load_table
    from odl_etl_spark.operators.similarity import IvfIndex
    from odl_etl_spark.queries.similarity import _probe_vec

    e = load_table(spark, sf_dir, "embeddings")
    probe = _probe_vec(spark, sf_dir, 0)
    index = IvfIndex.build(e, n_cells=8)
    d = str(tmp_path / "ivf")
    index.assign(e.where(F.col("vec_id") != 0)).write.partitionBy(
        "cell_id"
    ).parquet(d)
    cells = index.nearest_cells(probe, 2)
    flt = spark.read.parquet(d).where(F.col("cell_id").isin(cells))
    plan = flt._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
    assert scan_lines, plan
    part_filters = scan_lines[0].split("PartitionFilters:")[1].split(
        "PushedFilters:"
    )[0]
    assert "cell_id" in part_filters, scan_lines[0]
    assert "DataFilters: []" in scan_lines[0], scan_lines[0]
    got_cells = {r["cell_id"] for r in flt.select("cell_id").distinct().collect()}
    assert got_cells <= set(cells)


def test_stream_running_totals_partial_aggs_one_user_window(spark, sf_dir):
    """`stream_running_totals` pin: both aggregations show map-side
    partial functions before their exchange, the cumulative state window
    partitions by user (parallel sorts — never an unpartitioned window
    over the events), and the only SinglePartition exchange is the
    ntile machinery's O(#partitions)-row offset table."""
    from odl_etl_spark.queries import registry

    df = registry()["stream_running_totals"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan and "partial_sum" in plan, plan
    assert "windowspecdefinition(user_id" in plan, plan
    # ntile's offset table is the lone single-partition stage; the
    # events-level relations never collapse to one partition.
    single = [l for l in plan.splitlines() if "SinglePartition" in l]
    assert len(single) <= 1, plan


def test_ann_index_ingest_probe_appends_batch_only_no_corpus_shuffle(
    spark, sf_dir
):
    """`ann_index_ingest_probe` pin: the appended batch's signature scan
    pushes the arrival predicate into the parquet reader (only the new
    vectors are re-encoded — the daily-ingest contract), the candidate
    set reaches the raw vectors as a broadcast semi-join, and the final
    top-k is TakeOrderedAndProject (no global sort, no corpus-wide
    exchange)."""
    from odl_etl_spark.queries import registry

    df = registry()["ann_index_ingest_probe"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "LeftSemi" in plan and "BroadcastExchange" in plan, plan
    # The appended-batch scan carries the arrival filter pushed down.
    assert "PushedFilters: [IsNotNull(vec_id), Not(EqualTo(vec_id,0))]" in plan or (
        "Not(EqualTo(vec_id,0))" in plan
    ), plan
    assert "SortMergeJoin" not in plan, plan


def test_ann_index_pq_ingest_probe_broadcast_only_no_sort_merge(spark, sf_dir):
    """`ann_index_pq_ingest_probe` pin: the ADC scoring and the exact
    re-rank run entirely through broadcast hash joins (the 128-entry LUT
    and the bounded shortlist — no SortMergeJoin anywhere), the
    shortlist and the final top-k are TakeOrderedAndProject (partial
    per-partition top-k, no global sort), and the batch/corpus encode
    scans push the vec_id filters into the parquet reader."""
    from odl_etl_spark.queries import registry

    df = registry()["ann_index_pq_ingest_probe"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject(limit=10" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Not(EqualTo(vec_id,0))" in plan, plan


def test_ann_index_ivf_ingest_probe_cell_filter_no_sort_merge(spark, sf_dir):
    """`ann_index_ivf_ingest_probe` pin: the search touches only the
    nprobe cells (cell_id filter — partition pruning against the stored
    layout), the appended batch's assign scan pushes the vec_id filter
    into the parquet reader, the top-k is TakeOrderedAndProject, and no
    SortMergeJoin appears anywhere (assignment is a broadcast of the
    8-row centroid parameter set, never a corpus-side shuffle join)."""
    from odl_etl_spark.queries import registry

    df = registry()["ann_index_ivf_ingest_probe"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject(limit=10" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "cell_id" in plan, plan
    assert "Not(EqualTo(vec_id,0))" in plan, plan


def test_no_unbounded_fact_broadcasts_in_dedup_sim_corpus_families(
    spark, sf_dir
):
    """Registry-wide invariant, pinned on the families where the hazard
    class lives: no key in the dedup_* / sim_* / corpus_* families may
    broadcast a subtree that scans a fact table without a
    cardinality-bounding operator in between (the round-9 finding — the
    planner's size estimate for a derived relation does not track the
    data, so such a broadcast OOMs at scale; SCALING.md "Registry-wide
    broadcast audit"). tools/broadcast_audit.py sweeps all keys at
    round cadence; this pin keeps the fixed families fixed in CI."""
    from odl_etl_spark.plans import audit_fact_broadcasts
    from odl_etl_spark.queries import registry

    flagged = {}
    for name, spec in registry().items():
        if not name.startswith(("dedup_", "sim_", "corpus_", "ann_index_")):
            continue
        flags = audit_fact_broadcasts(spec.build(spark, sf_dir))
        if flags:
            flagged[name] = flags
    assert not flagged, flagged


def test_late_drop_watermark_table_broadcasts(spark, sf_dir):
    # The 4-row per-batch watermark table must broadcast into the fact
    # admission filter (in the real engine it is a scalar per
    # micro-batch); the arrival slicing must ride the distributed
    # two-level rank (ExistingRDD + _pid-partitioned row_number), never
    # an unpartitioned fact-wide window; and the final tumbling agg is
    # a partial+final hash agg.
    df = build("stream_late_drop", spark, sf_dir)
    plan = explain_str(df)
    assert has_broadcast_join(df)
    assert "existingrdd" in plan.lower()
    specs = re.findall(r"Arguments: \[(\w+\(\S*\)) windowspecdefinition\(([^,]+)", plan)
    assert specs, "no window specs found"
    for fn, first_arg in specs:
        # row_number rides _pid partitions; the only other windows are
        # the O(#batches)-row offset/watermark tables (4 rows).
        assert first_arg.startswith("_pid") or not fn.startswith("row_number"), (
            fn,
            first_arg,
        )
    assert "HashAggregate" in plan


def test_schema_widening_scan_stays_vectorized(spark, sf_dir):
    # The widened read must stay ONE parquet scan (columnar batch scan,
    # no per-era union in the plan) with the widened data schema pushed
    # down — bigint cust in ReadSchema — and the per-era agg is a
    # partial+final hash agg on the partition column.
    df = build("scan_schema_widening", spark, sf_dir)
    plan = explain_str(df)
    assert "Union" not in plan
    # formatted explain names each node once in the tree and once in
    # the detail section — count the numbered detail headers.
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "cust:bigint" in plan.replace(" ", "") or "cust: bigint" in plan
    assert "HashAggregate" in plan


def test_dpp_join_prunes_fact_partitions(spark, sf_dir):
    # Round-14 addition: the fact scan must carry a dynamic-pruning
    # PartitionFilter fed by the broadcast dim join — the partition
    # predicate exists ONLY through the join (query text never names
    # nations), so its presence proves Catalyst inserted the DPP
    # subquery. The dim side must be the broadcast build side.
    df = build("scan_dpp_join", spark, sf_dir)
    plan = explain_str(df)
    assert "dynamicpruningexpression" in plan, "DPP filter missing from fact scan"
    assert "BroadcastHashJoin" in plan
    # The fact scan reads only the aggregate's columns (projection
    # pushdown) — not the whole orders row.
    m = re.search(r"ReadSchema: struct<o_totalprice:double>", plan)
    assert m, "fact scan reads more than the projected column"


def test_table_profile_expand_stays_hash_not_sort(spark, sf_dir):
    # The 5 exact COUNT(DISTINCT)s ride ONE Expand whose aggregate must
    # stay HASH-based: round-14 lesson — putting min(string)/max(string)
    # into the same query gave every Expand aggregate a variable-width
    # buffer, falling to SortAggregate = a full sort of the 6x-expanded
    # fact (116.8 s vs ~30 s at sf10p). The min/max live in a sibling
    # keyless aggregate (SortAggregate WITHOUT a Sort — no grouping
    # keys), crossJoined 1-row x 1-row. Pin: no Sort operator anywhere,
    # Expand present, exactly two column-pruned scans of orders.
    df = build("table_profile", spark, sf_dir)
    plan = explain_str(df)
    assert plan.count("Expand") >= 1
    assert "Generate" in plan
    assert len(re.findall(r"\(\d+\) Sort\b", plan)) == 0, "Expand agg fell to sort"
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2
    assert shuffle_count(df) <= 3  # two partial->final aggs + distinct


def test_pq_encode_argmin_stays_hash_aggregated(spark, sf_dir):
    # Round-14: min(struct(d2q, code)) demoted BOTH phases of the
    # per-(vec,sub) argmin to SortAggregate (variable-width buffer) — a
    # full sort of the N x PQ_CODES candidate rows. The packed-bigint
    # MIN keeps it hash-aggregated; no grouped SortAggregate (and hence
    # no aggregate-feeding Sort) may appear anywhere in the PQ plans.
    # sim_ann_ivfpq threads cell_id through the encode's group keys
    # (extra_keys) — the extra bigint key must not change the verdict.
    for key in ("sim_ann_pq", "ann_index_pq_ingest_probe", "sim_ann_ivfpq"):
        plan = explain_str(build(key, spark, sf_dir))
        assert "SortAggregate" not in plan, key


def test_sort_audit_matches_sort_within_subtree_only():
    # ADVICE r14 #2: the audit must flag a grouped SortAggregate only
    # when ITS direct child is a Sort — an orderBy's Sort elsewhere in
    # the plan (or an already-sorted SMJ feed) must not flag it.
    from tools.sort_audit import _demoted_sort_aggregates

    demoted = "\n".join([
        "AdaptiveSparkPlan isFinalPlan=true",
        "+- SortAggregate(key=[k#1], functions=[min(s#2)])",
        "   +- *(2) Sort [k#1 ASC NULLS FIRST], false, 0",
        "      +- Exchange hashpartitioning(k#1, 8)",
        "         +- SortAggregate(key=[k#1], functions=[partial_min(s#2)])",
        "            +- Sort [k#1 ASC NULLS FIRST], false, 0",
        "               +- Scan parquet [k#1,s#2]",
    ])
    assert _demoted_sort_aggregates(demoted) == 2

    # A Sort ANYWHERE ELSE (top-level orderBy above a hash aggregate,
    # plus a keyless SortAggregate) must not flag.
    benign = "\n".join([
        "*(3) Sort [n#5 DESC], true, 0",
        "+- HashAggregate(keys=[k#1], functions=[count(1)])",
        "   +- Exchange hashpartitioning(k#1, 8)",
        "      +- HashAggregate(keys=[k#1], functions=[partial_count(1)])",
        "         +- SortAggregate(key=[], functions=[min(s#2)])",
        "            +- Scan parquet [k#1,s#2]",
    ])
    assert _demoted_sort_aggregates(benign) == 0

    # Grouped SortAggregate fed by already-sorted input (no Sort child):
    # no extra sort inserted -> benign.
    presorted = "\n".join([
        "SortAggregate(key=[k#1], functions=[min(s#2)])",
        "+- SortMergeJoin [k#1], [k#3], Inner",
        "   :- Sort [k#1 ASC], false, 0",
        "   +- Sort [k#3 ASC], false, 0",
    ])
    assert _demoted_sort_aggregates(presorted) == 0


def test_sort_audit_exit_codes(tmp_path):
    # Exit 0 = all audited clean; exit 2 = a key ERRORED during build
    # (previously swallowed into the JSON with exit 0 — CI could go
    # green over broken keys). Run the tool on one clean key and one
    # nonexistent sf_dir (forces a build error) via subprocess.
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    out = tmp_path / "audit.json"
    ok = subprocess.run(
        [sys.executable, "tools/sort_audit.py", str(out), "scan_pruned"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert ok.returncode == 0, ok.stdout + ok.stderr
    env["SPARK_GRAFT_SF_DIR"] = str(tmp_path / "nonexistent_sf")
    err = subprocess.run(
        [sys.executable, "tools/sort_audit.py", str(out), "scan_pruned"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert err.returncode == 2, err.stdout + err.stderr
    assert json.load(open(out))["errors"]


def test_shuffle_audit_exit_codes(tmp_path):
    # The shuffle-count ratchet (round-15): exit 0 when the audited key
    # is at its checked-in baseline; exit 1 when a key shuffles MORE
    # than its baseline OR is absent from the baseline (new keys must
    # be baselined deliberately); exit 2 on build errors, like the
    # sort audit.
    import json
    import os
    import shutil
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    out = tmp_path / "audit.json"
    ok = subprocess.run(
        [sys.executable, "tools/shuffle_audit.py", str(out), "scan_pruned"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert ok.returncode == 0, ok.stdout + ok.stderr
    rep = json.load(open(out))
    assert not rep["regressed"] and not rep["unbaselined"]

    # Regression path: copy the repo with a tampered baseline (the tool
    # reads SHUFFLE_BASELINE.json at ITS repo root, so point a copy of
    # the tool tree at a doctored one).
    fake = tmp_path / "repo"
    fake.mkdir()
    (fake / "tools").mkdir()
    shutil.copy(os.path.join(repo, "tools", "shuffle_audit.py"), fake / "tools")
    base = json.load(open(os.path.join(repo, "SHUFFLE_BASELINE.json")))
    assert base["scan_pruned"] >= 0
    doctored = dict(base)
    doctored["scan_pruned"] = -1  # any real count now "regresses"
    json.dump(doctored, open(fake / "SHUFFLE_BASELINE.json", "w"))
    # The copied tool tree has no package — put the real repo on PYTHONPATH.
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    bad = subprocess.run(
        [sys.executable, "tools/shuffle_audit.py", str(out), "scan_pruned"],
        cwd=str(fake), env=env, capture_output=True, text=True, timeout=600,
    )
    assert bad.returncode == 1, bad.stdout + bad.stderr
    assert json.load(open(out))["regressed"]["scan_pruned"]["now"] >= 0

    # Unbaselined path: remove the key from the doctored baseline.
    doctored.pop("scan_pruned")
    json.dump(doctored, open(fake / "SHUFFLE_BASELINE.json", "w"))
    miss = subprocess.run(
        [sys.executable, "tools/shuffle_audit.py", str(out), "scan_pruned"],
        cwd=str(fake), env=env, capture_output=True, text=True, timeout=600,
    )
    assert miss.returncode == 1, miss.stdout + miss.stderr
    assert "scan_pruned" in json.load(open(out))["unbaselined"]

    # A typo'd key name must error (exit 2), not produce a green
    # "0 audited" run.
    typo = subprocess.run(
        [sys.executable, "tools/shuffle_audit.py", str(out), "scan_prunedd"],
        cwd=repo, env=dict(os.environ), capture_output=True, text=True,
        timeout=600,
    )
    assert typo.returncode == 2, typo.stdout + typo.stderr
    assert json.load(open(out))["errors"]["scan_prunedd"] == "not a registry key"


def test_table_profile_incremental_mergeable_crawl_shape(spark, sf_dir):
    # Round-15 addition. Three pins: (1) the per-partition crawl
    # aggregates stay hash-based — HLL sketch buffers ride
    # ObjectHashAggregate and the min/max columns are deliberately
    # fixed-width, so NO grouped SortAggregate appears (the round-14
    # demotion class); (2) standing and delta branches scan orders with
    # the era predicates AT THE SCAN (DataFilters), so on a dated
    # production layout the delta crawl is a pruned read; (3) exactly
    # three column-pruned scans of orders (standing crawl, delta crawl,
    # exact-NDV differential anchor) — the merge itself reads only
    # artifact rows.
    from tools.sort_audit import _demoted_sort_aggregates

    df = build("table_profile_incremental", spark, sf_dir)
    plan = explain_str(df)
    assert _demoted_sort_aggregates(plan) == 0
    assert "ObjectHashAggregate" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 3
    era_filters = [
        ln for ln in plan.splitlines()
        if ln.strip().startswith("PushedFilters:") and "o_orderdate" in ln
    ]
    assert len(era_filters) == 2, era_filters
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    for ln in reads:  # column pruning: only the three profiled columns
        assert "o_orderstatus" not in ln and "o_comment" not in ln
