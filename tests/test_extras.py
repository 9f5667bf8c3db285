"""Property tests for the round-3 operator tier (queries/extras.py):
invariants the DuckDB oracle can't express (bounds, conservation laws,
degenerate inputs)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from odl_etl_spark.queries import registry


def build(name, spark, sf_dir):
    return registry()[name].build(spark, sf_dir)


def test_containment_is_bounded_and_reflexively_asymmetric(spark, sf_dir):
    rows = build("text_ngram_containment", spark, sf_dir).collect()
    assert rows, "neighbor pairs must exist"
    for r in rows:
        assert 0.0 <= r["containment"] <= 1.0


def test_quality_gopher_flags_follow_metrics(spark, sf_dir):
    for r in build("quality_gopher", spark, sf_dir).collect():
        want = (
            50 <= r["n_words"] <= 100000
            and 3 <= r["mean_word_len"] <= 10
            and r["stop_ratio"] >= 0.005
        )
        assert r["keep"] == want, r


def test_c4_keep_counts_are_consistent(spark, sf_dir):
    for r in build("corpus_filter_c4", spark, sf_dir).collect():
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert abs(r["keep_rate"] - r["n_kept"] / r["n_docs"]) < 1e-3


def test_entropy_bounds(spark, sf_dir):
    # 0 <= H <= log(n_tokens); uniform docs hit the upper bound.
    for r in build("text_entropy", spark, sf_dir).collect():
        # entropy is reported on a 1e-4 grid; allow the rounding slack
        assert -1e-9 <= r["entropy"] <= math.log(r["n_tokens"]) + 1e-3


def test_pq_codebook_conserves_vectors(spark, sf_dir):
    # Every vector gets exactly one code per subspace: per-subspace
    # n_vecs sums to the corpus size; avg distances are non-negative.
    from odl_etl_spark.io.sources import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    rows = build("emb_pq_codebook", spark, sf_dir).collect()
    per_sub: dict[int, int] = {}
    for r in rows:
        per_sub[r["sub"]] = per_sub.get(r["sub"], 0) + r["n_vecs"]
        assert r["avg_d2"] >= 0
    assert set(per_sub) == set(range(8))
    assert all(v == n for v in per_sub.values()), per_sub


def test_rfm_scores_are_quintiles(spark, sf_dir):
    rows = build("events_rfm", spark, sf_dir).collect()
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        counts: dict[int, int] = {}
        for r in rows:
            assert 1 <= r[col] <= 5
            counts[r[col]] = counts.get(r[col], 0) + 1
        # exact NTILE: tile sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1, (col, counts)
        assert sum(counts.values()) == n


def test_backlog_is_monotone_and_totals(spark, sf_dir):
    from odl_etl_spark.io.sources import load_table

    rows = build("orders_backlog", spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    cum = [r["cum_orders"] for r in rows]
    assert cum == sorted(cum)
    assert cum[-1] == n_orders
    assert sum(r["n_orders"] for r in rows) == n_orders


def test_active_users_wau_geq_dau(spark, sf_dir):
    for r in build("events_active_users", spark, sf_dir).collect():
        assert r["wau"] >= r["dau"] > 0


def test_funnel_time_rates(spark, sf_dir):
    r = build("events_funnel_time", spark, sf_dir).collect()[0]
    assert 0 <= r["n_converted"] <= r["n_viewed"]
    assert abs(r["conv_rate"] - r["n_converted"] / r["n_viewed"]) < 1e-3
    if r["n_converted"]:
        assert r["avg_hours"] > 0 and r["p50_hours"] > 0


def test_norm_stats_min_leq_avg_leq_max(spark, sf_dir):
    for r in build("emb_norm_stats", spark, sf_dir).collect():
        assert r["min_norm"] - 1e-4 <= r["avg_norm"] <= r["max_norm"] + 1e-4


def test_interval_overlap_is_symmetric_free(spark, sf_dir):
    # Each unordered pair counted once: k1 < k2 dedups mirror pairs, so
    # no customer can exceed C(orders_per_cust, 2).
    from odl_etl_spark.io.sources import load_table

    per_cust = {
        r["o_custkey"]: r["n"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in build("join_interval_overlap", spark, sf_dir).collect():
        c = per_cust[r["custkey"]]
        assert r["n_overlaps"] <= c * (c - 1) // 2


def test_weighted_avg_between_min_and_max_price(spark, sf_dir):
    # A weighted mean of unit prices must lie within the per-brand
    # unit-price envelope (price here = extendedprice/quantity aggregate,
    # so compare against extendedprice bounds loosely: positivity +
    # finiteness is the cheap invariant).
    for r in build("agg_weighted", spark, sf_dir).collect():
        assert r["w_avg_price"] > 0 and r["total_qty"] > 0


def test_scaled_sum_headroom_guard_raises_before_wraparound():
    """The scaled-BIGINT determinism pattern must refuse configurations
    where the exact integer sum could silently wrap int64."""
    import pytest

    from odl_etl_spark.functions.numeric import assert_scaled_sum_headroom

    # sf0.1-scale corpus: ample headroom, no raise.
    assert_scaled_sum_headroom(5_000, 16.0, 10**9)
    # A 100-billion-row group of unit terms at scale 1e9 would overflow
    # int64 ~10x over — must raise, not wrap.
    with pytest.raises(OverflowError, match="headroom"):
        assert_scaled_sum_headroom(100_000_000_000, 1.0, 10**9)
    # Boundary: exactly at the margin limit passes, one order up raises.
    assert_scaled_sum_headroom(10**9, 1.0, 10**9, margin=8)
    with pytest.raises(OverflowError):
        assert_scaled_sum_headroom(10**10, 1.0, 10**9, margin=8)


def test_recursive_cte_does_not_leak_row_limit(spark, sf_dir):
    """ADVICE r5: the loosened cteRecursionRowLimit must be scoped to the
    query, not leaked into the shared session — and must still govern at
    execution time (the cap is read when the DataFrame runs, not when
    it is built)."""
    from odl_etl_spark.queries import registry

    before = spark.conf.get("spark.sql.cteRecursionRowLimit")
    df = registry()["sql_recursive_cte"].build(spark, sf_dir)
    assert spark.conf.get("spark.sql.cteRecursionRowLimit") == before
    assert df.count() > 0  # executes under the forked session's cap
    assert spark.conf.get("spark.sql.cteRecursionRowLimit") == before
