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
    "agg_weighted": ("odl_etl_spark.queries.extras", "agg_weighted"),
    "text_entropy": ("odl_etl_spark.queries.extras", "text_entropy"),
    "emb_norm_stats": ("odl_etl_spark.queries.extras", "emb_norm_stats"),
    "graph_pagerank": ("odl_etl_spark.functions.numeric", "pagerank"),
}

# Q1-shape keys route through scaled_sum_acc_type instead (they widen to
# DECIMAL(38,0) past the ceiling rather than refusing); both import it
# from functions.numeric at call time, so the patch point is the module.
_WIDENED = {
    "agg_groupby": "agg_groupby sum_charge",
    "sql_tpch_q1": "sql_tpch_q1 sum_charge",
}


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
    import odl_etl_spark.functions.numeric as num
    from odl_etl_spark.queries import registry

    calls: list[str] = []
    real = num.scaled_sum_acc_type

    def recording(n_rows, max_abs_term, scale, margin=8, what="scaled sum"):
        calls.append(what)
        return real(n_rows, max_abs_term, scale, margin, what)

    monkeypatch.setattr(num, "scaled_sum_acc_type", recording)
    df = registry()[key].build(spark, sf_dir)
    assert any(_WIDENED[key] in w for w in calls), (key, calls)
    assert df.columns


@pytest.mark.parametrize("key", sorted(_WIDENED))
def test_widened_decimal_sums_match_bigint_exactly(key, spark, sf_dir, monkeypatch):
    """Force the DECIMAL(38,0) branch by shrinking the ceiling and prove
    the widened plan returns the bit-identical rows AND schema as the
    int64 plan at a scale where int64 is provably exact — the widening
    changes only the accumulator's range, never a value."""
    import odl_etl_spark.functions.numeric as num
    from odl_etl_spark.queries import registry

    q = registry()[key]
    narrow = q.build(spark, sf_dir)
    keys = ["l_returnflag", "l_linestatus"]
    narrow_rows = [tuple(r) for r in narrow.orderBy(*keys).collect()]
    narrow_schema = narrow.schema

    monkeypatch.setattr(num, "INT64_MAX", 10**9)  # any sf trips this
    assert num.scaled_sum_needs_decimal(6000, 113_400.0, 10**6)
    wide = q.build(spark, sf_dir)
    assert wide.schema == narrow_schema
    assert [tuple(r) for r in wide.orderBy(*keys).collect()] == narrow_rows


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
