"""Measured candidate-budget sweep for `sim_rerank_pipeline` (VERDICT r7
Next-round #3): recall@10 of the LSH-candidates -> MaxSim-rerank
composition vs EXACT MaxSim ranking, across (n_planes, Hamming radius)
configs, tri-scale, computed entirely on the DuckDB oracle side (the
differential check proves Spark == oracle, so the oracle IS the
pipeline for quality measurement — engine-independent, same posture as
tests/test_properties.py::test_ann_recall_floors_on_fixture).

Run:  python tools/rerank_sweep.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from odl_etl_spark.queries.compose import _maxsim_score_sql
from odl_etl_spark.queries.similarity import _DOT

SCALES = ["sf0.001", "sf0.01", "sf0.1"]
# Fixture root: honor the same env convention as bench.py — the sweep
# must be reproducible wherever the fixtures live. SPARK_GRAFT_SF_DIR
# points AT a scale dir (e.g. .../sf0.1); its parent is the root.
ROOT = os.path.dirname(
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/")
)


def rerank_sql(n_planes: int, radius: int) -> str:
    return f"""
    WITH hp AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS h,
             embedding AS hvec
      FROM embeddings WHERE vec_id BETWEEN 1 AND {n_planes}
    ), sig AS (
      SELECT e.vec_id, e.embedding,
             SUM(CASE WHEN ({_DOT.format(a='e.embedding', b='hp.hvec')}) >= 0
                      THEN CAST(POW(2, hp.h) AS BIGINT) ELSE 0 END) AS bucket
      FROM embeddings e CROSS JOIN hp
      GROUP BY e.vec_id, e.embedding
    ), psig AS (SELECT bucket FROM sig WHERE vec_id = 0),
    p AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
    cand AS (
      SELECT s.vec_id, s.embedding FROM sig s, psig
      WHERE bit_count(xor(s.bucket, psig.bucket)) <= {radius} AND s.vec_id <> 0
    )
    SELECT e.vec_id,
           ROUND(({_maxsim_score_sql()}) * 1000000) / 1000000 AS maxsim
    FROM cand e, p
    ORDER BY maxsim DESC, vec_id ASC LIMIT 10
    """


EXACT_SQL = f"""
    WITH p AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(({_maxsim_score_sql()}) * 1000000) / 1000000 AS maxsim
    FROM embeddings e, p WHERE e.vec_id <> 0
    ORDER BY maxsim DESC, vec_id ASC LIMIT 10
"""

CAND_FRAC_SQL = """
    WITH hp AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS h,
             embedding AS hvec
      FROM embeddings WHERE vec_id BETWEEN 1 AND {n_planes}
    ), sig AS (
      SELECT e.vec_id,
             SUM(CASE WHEN ({dot}) >= 0
                      THEN CAST(POW(2, hp.h) AS BIGINT) ELSE 0 END) AS bucket
      FROM embeddings e CROSS JOIN hp
      GROUP BY e.vec_id
    ), psig AS (SELECT bucket FROM sig WHERE vec_id = 0)
    SELECT AVG(CASE WHEN bit_count(xor(s.bucket, psig.bucket)) <= {radius}
               THEN 1.0 ELSE 0.0 END) AS frac
    FROM sig s, psig WHERE s.vec_id <> 0
"""


def main() -> None:
    configs = [(5, 2), (5, 3), (4, 2), (4, 3), (3, 2), (6, 3)]
    print(f"{'config':>12s} " + " ".join(f"{s:>22s}" for s in SCALES))
    for n_planes, radius in configs:
        cells = []
        for sf in SCALES:
            con = duckdb.connect()
            con.execute(
                "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
                f"'{os.path.join(ROOT, sf, 'embeddings.parquet')}')"
            )
            exact = {r[0] for r in con.execute(EXACT_SQL).fetchall()}
            got = {
                r[0] for r in con.execute(rerank_sql(n_planes, radius)).fetchall()
            }
            frac = con.execute(
                CAND_FRAC_SQL.format(
                    n_planes=n_planes,
                    radius=radius,
                    dot=_DOT.format(a="e.embedding", b="hp.hvec"),
                )
            ).fetchone()[0]
            cells.append(f"r@10={len(got & exact) / 10:.1f} cf={frac:.2f}")
            con.close()
        print(f"p={n_planes} H<={radius:<2d} " + " ".join(f"{c:>22s}" for c in cells))


if __name__ == "__main__":
    main()
