#!/usr/bin/env python
"""Shuffle-count regression audit: pin every registry key's number of
shuffle exchanges against a checked-in baseline.

Every groupBy/join/distinct/repartition is a shuffle, and at 100 TB the
shuffle count is the plan property that dominates cost — yet it can
regress silently: a refactor that drops a broadcast hint, re-keys an
aggregation, or breaks an exchange-reuse turns one shuffle into three
with no correctness signal at any test scale. The sort audit pins the
HashAggregate verdict and the broadcast audit pins what broadcasts;
this pins HOW MANY TIMES each key's data crosses the network.

Counts are pre-AQE ``Exchange hashpartitioning/rangepartitioning``
nodes (broadcast exchanges are not shuffles — the broadcast audit owns
those) from the same `plans.inspect.shuffle_count` the plan tests use,
taken at a fixed scale/conf so they are deterministic.

Usage:
  python tools/shuffle_audit.py [out.json] [key1,key2,...]
  python tools/shuffle_audit.py --update            # (re)write baseline

Baseline: SHUFFLE_BASELINE.json at the repo root (key -> count).
Exit 0 = every audited key at or below its baseline (improvements are
reported, not flagged; run --update to ratchet them in). Exit 1 = some
key shuffles MORE than its baseline, or is missing from the baseline
(new keys must be baselined deliberately). Exit 2 = a key errored
during build — green must mean "all keys audited", ADVICE r14 #2.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SHUFFLE_BASELINE.json",
)


def main() -> None:
    update = "--update" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--update"]
    out_path = args[0] if args else "/tmp/shuffle_audit.json"
    only = args[1].split(",") if len(args) > 1 else None

    from odl_etl_spark.plans.inspect import shuffle_count
    from odl_etl_spark.queries import registry
    from odl_etl_spark.session import get_spark

    spark = get_spark(
        "shuffle-audit",
        master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    reg = registry()
    counts: dict[str, int] = {}
    errors: dict[str, str] = {}
    if only:
        # A typo'd key must not yield a green "0 audited" run — green
        # means every REQUESTED key was audited (the sort-audit lesson,
        # ADVICE r14 #2, applied to the request side).
        for name in set(only) - set(reg):
            errors[name] = "not a registry key"
    for name, q in reg.items():
        if only and name not in only:
            continue
        try:
            counts[name] = shuffle_count(q.build(spark, sf_dir))
        except Exception as e:  # pragma: no cover — diagnostic tool
            errors[name] = f"{type(e).__name__}: {e}"[:200]

    if update:
        if errors:
            # Refuse to rewrite the baseline from a partial sweep: a
            # baseline written while keys errored would silently drop
            # those keys from the ratchet (ADVICE r15 #3).
            print(
                f"baseline NOT updated: {len(errors)} key(s) errored "
                f"({', '.join(sorted(errors))}) — fix and re-run"
            )
            spark.stop()
            sys.exit(2)
        baseline = {}
        if os.path.exists(BASELINE_PATH):
            with open(BASELINE_PATH) as f:
                baseline = json.load(f)
        baseline.update(counts)
        with open(BASELINE_PATH, "w") as f:
            json.dump(dict(sorted(baseline.items())), f, indent=1)
        print(f"baseline updated: {len(counts)} keys -> {BASELINE_PATH}")
        spark.stop()
        sys.exit(0)

    baseline: dict[str, int] = {}
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            baseline = json.load(f)
    regressed: dict[str, dict[str, int]] = {}
    improved: dict[str, dict[str, int]] = {}
    unbaselined: dict[str, int] = {}
    for name, n in counts.items():
        if name not in baseline:
            unbaselined[name] = n
            print(f"{name}: {n} shuffle(s), NOT IN BASELINE", flush=True)
        elif n > baseline[name]:
            regressed[name] = {"baseline": baseline[name], "now": n}
            print(f"{name}: {baseline[name]} -> {n} shuffles (REGRESSED)", flush=True)
        elif n < baseline[name]:
            improved[name] = {"baseline": baseline[name], "now": n}
    with open(out_path, "w") as f:
        json.dump(
            {
                "regressed": regressed,
                "unbaselined": unbaselined,
                "improved": improved,
                "errors": errors,
                "audited": len(counts),
            },
            f,
            indent=1,
        )
    print(
        f"{len(counts)} audited: {len(regressed)} regressed, "
        f"{len(unbaselined)} unbaselined, {len(improved)} improved, "
        f"{len(errors)} errored -> {out_path}"
    )
    spark.stop()
    # Errors dominate (ADVICE r15 #3): "some keys could not be audited"
    # must never be masked by a simultaneous regression — a caller that
    # only checks the code needs exit 2 to mean the sweep is incomplete.
    sys.exit(2 if errors else (1 if (regressed or unbaselined) else 0))


if __name__ == "__main__":
    main()
