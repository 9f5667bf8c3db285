"""Every scaled-BIGINT aggregation must route through
``assert_scaled_sum_headroom`` — int64 wraparound in a scaled sum is
SILENT on the Spark side, so the bound has to be checked at build time,
not documented (VERDICT.md r4, Next-round #5).

Two layers: (1) a coverage test proving each scaled-BIGINT key calls
the guard while building its plan; (2) synthetic-overflow cases per
guard family showing the worst-case arithmetic actually trips it.
"""

from __future__ import annotations

import pytest

from odl_etl_spark.functions.numeric import assert_scaled_sum_headroom

# key -> (module holding the imported guard name, substring of `what`)
_GUARDED = {
    "emb_covariance": ("odl_etl_spark.queries.ml", "emb_covariance"),
    "text_entropy": ("odl_etl_spark.queries.extras", "text_entropy"),
    "emb_norm_stats": ("odl_etl_spark.queries.extras", "emb_norm_stats"),
    "graph_pagerank": ("odl_etl_spark.functions.numeric", "pagerank"),
}

# Money-sum keys route through scaled_sum_acc_type instead (they widen
# to DECIMAL(38,0) past the ceiling rather than refusing). Patch point:
# agg_groupby imports it from functions.numeric at call time; the
# extras/tpch/sources helpers bound it at module import.
_WIDENED = {
    "agg_groupby": ("odl_etl_spark.functions.numeric", "agg_groupby sum_charge"),
    "sql_tpch_q1": ("odl_etl_spark.queries.extras", "sql_tpch_q1 sum_charge"),
    "sql_tpch_q9": ("odl_etl_spark.queries.tpch", "sql_tpch_q9 amount"),
    "agg_weighted": ("odl_etl_spark.queries.extras", "agg_weighted price*qty"),
    # io.sources.money_acc imports the helper lazily at call time, so
    # the patch point for keys routed through it is functions.numeric.
    "agg_rollup": ("odl_etl_spark.functions.numeric", "agg_rollup total"),
}

# Every key whose scaled money SUM can outgrow int64 below ~1e12 rows
# now widens; the sweep proves widened == narrow bit-for-bit (rows AND
# schema) at a scale where int64 is provably exact. Sink/stream
# composites carry the same sum_cents acc plumbing but are exercised by
# their own roundtrip tests (building them twice here would double
# their scratch-layout writes for no added numeric coverage).
_WIDEN_SWEEP = [
    "sql_tpch_q1",
    "sql_tpch_q3",
    "sql_tpch_q5",
    "sql_tpch_q6",
    "sql_tpch_q7",
    "sql_tpch_q8",
    "sql_tpch_q9",
    "sql_tpch_q10",
    "sql_tpch_q11",
    "sql_tpch_q14",
    "sql_tpch_q15",
    "sql_tpch_q17",
    "sql_tpch_q19",
    "sql_tpch_q22",
    "agg_groupby",
    "agg_rollup",
    "agg_cube",
    "agg_histogram",
    "agg_grouping_id",
    "agg_weighted",
    "events_rfm",
    "orders_backlog",
    "join_broadcast",
    "join_multiway",
]


@pytest.mark.parametrize("key", sorted(_GUARDED))
def test_scaled_bigint_key_calls_headroom_guard(key, spark, sf_dir, monkeypatch):
    import importlib

    from odl_etl_spark.queries import registry

    mod_name, what_substr = _GUARDED[key]
    mod = importlib.import_module(mod_name)
    calls: list[str] = []

    def recording(n_rows, max_abs_term, scale, margin=8, what="scaled sum"):
        calls.append(what)
        return assert_scaled_sum_headroom(n_rows, max_abs_term, scale, margin, what)

    monkeypatch.setattr(mod, "assert_scaled_sum_headroom", recording)
    df = registry()[key].build(spark, sf_dir)
    assert any(what_substr in w for w in calls), (key, calls)
    assert df.columns  # the build returned a real plan


@pytest.mark.parametrize("key", sorted(_WIDENED))
def test_widening_key_calls_acc_type_guard(key, spark, sf_dir, monkeypatch):
    import importlib

    from odl_etl_spark.functions.numeric import scaled_sum_acc_type
    from odl_etl_spark.queries import registry

    mod = importlib.import_module(_WIDENED[key][0])
    calls: list[str] = []

    def recording(n_rows, max_abs_term, scale, margin=2, what="scaled sum"):
        calls.append(what)
        return scaled_sum_acc_type(n_rows, max_abs_term, scale, margin, what)

    monkeypatch.setattr(mod, "scaled_sum_acc_type", recording)
    df = registry()[key].build(spark, sf_dir)
    assert any(_WIDENED[key][1] in w for w in calls), (key, calls)
    assert df.columns


def test_widened_decimal_sums_match_bigint_exactly(spark, sf_dir):
    """Force the DECIMAL(38,0) branch by shrinking the ceiling and prove
    every widened plan returns the bit-identical rows AND schema as its
    int64 plan at a scale where int64 is provably exact — the widening
    changes only the accumulator's range, never a value. (Module-global
    patch, not monkeypatch per key: scaled_sum_needs_decimal reads
    numeric.INT64_MAX at call time wherever the helper was imported.)"""
    import odl_etl_spark.functions.numeric as num
    from odl_etl_spark.queries import registry

    specs = registry()
    orig = num.INT64_MAX
    failures = []
    for key in _WIDEN_SWEEP:
        q = specs[key]
        narrow = q.build(spark, sf_dir)
        narrow_rows = sorted((tuple(r) for r in narrow.collect()), key=repr)
        narrow_schema = narrow.schema
        try:
            num.INT64_MAX = 10**9  # any sf trips the widening
            assert num.scaled_sum_needs_decimal(6000, 113_400.0, 10**6)
            wide = q.build(spark, sf_dir)
            wide_schema = wide.schema
            wide_rows = sorted((tuple(r) for r in wide.collect()), key=repr)
        finally:
            num.INT64_MAX = orig
        if wide_schema != narrow_schema:
            failures.append((key, "schema", wide_schema, narrow_schema))
        elif wide_rows != narrow_rows:
            diff = [
                (a, b) for a, b in zip(narrow_rows, wide_rows) if a != b
            ][:3]
            failures.append((key, "values", diff))
    assert not failures, failures


# --- synthetic overflow per family -----------------------------------

def test_corpus_count_family_trips_at_scale():
    """emb_covariance / agg_weighted / sql_tpch_q1 guard on a table
    count: the 100 TB-scale row counts must trip the guard."""
    from odl_etl_spark.functions.numeric import LINEITEM_CHARGE_BOUND

    # The derived bound must cover the fixture's actual worst charge
    # (measured 113,306.70 at sf0.1) without the old 2e5 padding.
    assert 113_307 < LINEITEM_CHARGE_BOUND < 120_000
    # sf0.1-style counts clear easily.
    assert_scaled_sum_headroom(600_000, LINEITEM_CHARGE_BOUND, 10**6) is None
    # Documented ceiling (ADVICE r12 #3): INT64_MAX/(8·113,400·1e6)
    # ≈ 10.17M rows (~TPC-H sf1.7) — the point where DECIMAL(38,0)
    # widening becomes mandatory for the 1e6-scale charge sum. Pinned
    # from both sides.
    assert_scaled_sum_headroom(10_100_000, LINEITEM_CHARGE_BOUND, 10**6) is None
    with pytest.raises(OverflowError, match="sum_charge"):
        assert_scaled_sum_headroom(
            10_200_000, LINEITEM_CHARGE_BOUND, 10**6, what="sql_tpch_q1 sum_charge"
        )
    # TPC-H sf100k (~100 TB): lineitem ~6e11 rows — silent wrap territory.
    with pytest.raises(OverflowError, match="sum_charge"):
        assert_scaled_sum_headroom(
            600_000_000_000, LINEITEM_CHARGE_BOUND, 10**6, what="sql_tpch_q1 sum_charge"
        )
    # The widening predicate uses margin 2, not the refusal guard's 8:
    # the worst-case bound is HARD (analytic charge bound x exact count),
    # so int64 provably cannot wrap at any margin >= 1, and the decimal
    # lane costs a measured x5 (sf10p A/B, SCALING.md round-13) — widen
    # at the last provably-exact row, not eight times early. Ceiling
    # INT64_MAX/(2*113,400*1e6) ~ 40.67M rows (~TPC-H sf6.8), pinned
    # from both sides; the 100 TB count still widens (worst ~7e22, far
    # under decimal38's 1e38).
    from odl_etl_spark.functions.numeric import scaled_sum_acc_type

    assert scaled_sum_acc_type(40_600_000, LINEITEM_CHARGE_BOUND, 10**6) == "bigint"
    assert (
        scaled_sum_acc_type(40_700_000, LINEITEM_CHARGE_BOUND, 10**6)
        == "decimal(38,0)"
    )
    assert (
        scaled_sum_acc_type(600_000_000_000, LINEITEM_CHARGE_BOUND, 10**6)
        == "decimal(38,0)"
    )
    with pytest.raises(OverflowError, match="emb_covariance"):
        assert_scaled_sum_headroom(
            10**12, 16.0, 10**9, what="emb_covariance (i,j) product sum"
        )


def test_static_shape_family_bounds_are_static():
    """emb_norm_stats / text_entropy guard on per-row shape bounds that
    do NOT grow with the corpus — same numbers as the call sites."""
    assert_scaled_sum_headroom(65536, 16.0, 10**9)  # norm_stats site values
    assert_scaled_sum_headroom(10**8, 0.37, 10**6)  # entropy site values
    # A hypothetical 2**40-dim embedding would wrap — the guard says so.
    with pytest.raises(OverflowError):
        assert_scaled_sum_headroom(2**40, 16.0, 10**9)


def test_mass_invariant_family_scale_bound():
    """pagerank's contribution sum is bounded by total mass = SCALE;
    the invariant holds at 1e12 and would break near 1e18."""
    from odl_etl_spark.operators.pagerank import SCALE

    assert_scaled_sum_headroom(1, 1.0, SCALE)
    with pytest.raises(OverflowError):
        assert_scaled_sum_headroom(1, 1.0, 2 * 10**18)


def test_pq_pack_guard_raises_on_adversarial_vectors(spark):
    # ADVICE r14 #4: the packed-bigint argmin (MIN(d2q*PQ_CODES + code))
    # silently wrapped negative if d2q ever exceeded 2^63/PQ_CODES —
    # wrong code, no failure signal. The guard now raises at the first
    # offending row. The silent window is d2q in [2^63/16, 2^63): small
    # enough that the per-element ANSI cast and the SUM both succeed,
    # large enough that the ×16 pack wraps. Two vectors at ±1e4 per dim
    # put the cross-centroid quantized distance at 8*(2e4)^2*1e9 =
    # 3.2e18 — inside that window (the pre-guard code returned a WRONG
    # code here with no error; at ±1e6 the element cast itself trips
    # ANSI CAST_OVERFLOW, which was never the silent case).
    from odl_etl_spark.operators.ann_index import (
        _PQ_PACK_BOUND,
        PQ_CODES,
        pq_codebook,
        pq_encode,
        pq_explode,
    )

    assert _PQ_PACK_BOUND * PQ_CODES + (PQ_CODES - 1) < 2**63
    assert (_PQ_PACK_BOUND + 1) * PQ_CODES + (PQ_CODES - 1) >= 2**63

    e = spark.createDataFrame(
        [(1, [1.0e4] * 64), (2, [-1.0e4] * 64)],
        "vec_id bigint, v array<double>",
    )
    ex = pq_explode(e)
    cent = pq_codebook(ex)
    with pytest.raises(Exception, match="packed-argmin bound"):
        pq_encode(ex, cent).collect()


def test_pq_pack_guard_passes_unit_scale_vectors(spark):
    # The guard must be invisible for in-contract inputs: unit-ish
    # embeddings encode exactly as before, one code per (vec, sub).
    from odl_etl_spark.operators.ann_index import (
        PQ_SUBS,
        pq_codebook,
        pq_encode,
        pq_explode,
    )

    e = spark.createDataFrame(
        [(i, [((i * 37 + j * 11) % 97) / 97.0 for j in range(64)]) for i in range(1, 9)],
        "vec_id bigint, v array<double>",
    )
    ex = pq_explode(e)
    codes = pq_encode(ex, pq_codebook(ex))
    assert codes.count() == 8 * PQ_SUBS
    assert codes.groupBy("vec_id", "sub").count().where("count != 1").count() == 0
