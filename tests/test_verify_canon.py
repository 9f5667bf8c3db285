"""Pins for the plain-session driver replica's TYPE-AWARE canon
(.claude/skills/verify/verify_keys.py — VERDICT r11 #2).

The driver's hash check distinguishes value types across engines even
when the values are equal; round 10 proved the old value-only canon
cannot see that failure class (`stream_running_totals`: DuckDB NTILE →
BIGINT and windowed SUM(BIGINT) → HUGEINT vs Spark INT/BIGINT — green
in every local replica, red at the driver). These tests feed exactly
that skew into the replica's normalization and require it to FAIL, so
the class is catchable locally before a driver row ever goes red."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "verify_keys",
    Path(__file__).resolve().parents[1]
    / ".claude"
    / "skills"
    / "verify"
    / "verify_keys.py",
)
verify_keys = importlib.util.module_from_spec(_spec)
sys.modules["verify_keys"] = verify_keys
_spec.loader.exec_module(verify_keys)

duck_type_canon = verify_keys.duck_type_canon
spark_type_canon = verify_keys.spark_type_canon


def test_r10_skew_pair_fails_the_type_canon():
    """The round-10 incident's catchable signature: DuckDB windowed
    SUM(BIGINT) emits HUGEINT, which leaves the machine-integer lane in
    the driver's pandas/arrow-style canonicalization — the canon must
    declare it skewed against every Spark type."""
    assert spark_type_canon("bigint") != duck_type_canon("HUGEINT")
    assert spark_type_canon("int") != duck_type_canon("HUGEINT")
    # And the repaired form matches: both sides pinned BIGINT.
    assert spark_type_canon("bigint") == duck_type_canon("BIGINT")


def test_integer_widths_collapse_per_driver_evidence():
    """CALIBRATION, not nominal typing: Spark INT vs DuckDB BIGINT
    (row_number/ntile/rank/length lineage) passed the driver hash for
    14 keys across rounds 8-11, so machine-integer widths must collapse
    to one class — a strict int!=bigint canon false-fails six keys of
    the round-12 window (measured in round 12)."""
    assert spark_type_canon("int") == duck_type_canon("BIGINT")
    assert spark_type_canon("bigint") == duck_type_canon("INTEGER")
    assert spark_type_canon("smallint") == duck_type_canon("BIGINT")


def test_matching_types_normalize_equal():
    """The vocabularies the 187 oracled keys actually emit must agree
    when the engines agree — no false skew on the standard pairs."""
    pairs = [
        ("bigint", "BIGINT"),
        ("int", "INTEGER"),
        ("double", "DOUBLE"),
        ("float", "FLOAT"),
        ("double", "FLOAT"),
        ("string", "VARCHAR"),
        ("boolean", "BOOLEAN"),
        ("date", "DATE"),
        ("timestamp", "TIMESTAMP"),
        ("timestamp", "TIMESTAMP WITH TIME ZONE"),
        ("binary", "BLOB"),
        ("array<double>", "DOUBLE[]"),
        ("array<bigint>", "BIGINT[]"),
        ("array<string>", "VARCHAR[]"),
    ]
    for s, d in pairs:
        assert spark_type_canon(s) == duck_type_canon(d), (s, d)


def test_decimal_canon_keeps_scale_drops_precision():
    """Aggregate precision widening differs by engine without changing
    emitted values (DuckDB SUM → DECIMAL(38,s), Spark sum →
    decimal(p+10,s)) — the canon must NOT flag that; a SCALE skew it
    must flag."""
    assert spark_type_canon("decimal(22,2)") == duck_type_canon("DECIMAL(38,2)")
    assert spark_type_canon("decimal(22,2)") != duck_type_canon("DECIMAL(38,4)")


def test_hugeint_never_matches_any_spark_type():
    """Spark has no 128-bit integer: a DuckDB HUGEINT column is always
    a skew — the oracle SQL must CAST it down (the house rule)."""
    for s in ("tinyint", "smallint", "int", "bigint", "double", "decimal(38,0)"):
        assert spark_type_canon(s) != duck_type_canon("HUGEINT")
    assert spark_type_canon("bigint") != duck_type_canon("UHUGEINT")


def test_struct_map_nests_recurse_to_the_leaf():
    """ADVICE r12 #4 follow-through: STRUCT/MAP types recurse
    field-by-field, so a nested machine-int width collapses like a
    top-level one while a nested HUGEINT still reports skew at the
    precise leaf."""
    assert (
        duck_type_canon("STRUCT(a INTEGER, b VARCHAR)")
        == spark_type_canon("struct<a:int,b:string>")
    )
    assert (
        duck_type_canon("MAP(VARCHAR, BIGINT)")
        == spark_type_canon("map<string,int>")
    )
    # Nested list-of-struct with an int-width difference: still equal.
    assert (
        duck_type_canon("STRUCT(xs BIGINT[], d DOUBLE)")
        == spark_type_canon("struct<xs:array<int>,d:float>")
    )
    # A nested HUGEINT leaf must make the whole nest unmatchable.
    assert (
        duck_type_canon("STRUCT(a HUGEINT)")
        != spark_type_canon("struct<a:bigint>")
    )
    # Unmapped scalars still fall through raw (= always skew).
    assert duck_type_canon("BIT") == "bit"


def test_quoted_struct_field_names_canonicalize_symmetrically():
    # ADVICE r13 #3: a quoted duck identifier with mixed case and an
    # embedded space mis-split at the first space ('"MY FIELD" VARCHAR'
    # -> name '"MY', type 'FIELD" VARCHAR') and reported a false skew.
    # Both sides must land on the same lowercase name:type form.
    assert (
        duck_type_canon('STRUCT("My Field" VARCHAR, n BIGINT)')
        == spark_type_canon("struct<My Field:string,n:bigint>")
    )
    # multi-word TYPE still splits at the first space after the name
    got = duck_type_canon("STRUCT(ts TIMESTAMP WITH TIME ZONE)")
    assert got.startswith("struct<ts:")
    # escaped "" inside a quoted name, and a comma inside quotes must
    # not split the field list
    assert duck_type_canon('STRUCT("a""b,c" INTEGER)') == 'struct<a"b,c:integer>'
