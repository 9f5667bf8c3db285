"""Session-posture guards.

`spark.conf.set` accepts unknown keys silently, so a typo'd conf key is a
silent no-op — exactly the failure ADVICE r5 found with the bloom-filter
runtime-filter key. Pin every `spark.sql.*` key in DEFAULT_CONF and
cluster_conf against Spark's own registry (`SET -v`) so a rename in a
future Spark version (or a typo in ours) fails loudly here.
"""

from __future__ import annotations

import pytest

from odl_etl_spark.session import DEFAULT_CONF, cluster_conf

# Core (non-SQL) conf keys are not registered in SQLConf / `SET -v`;
# they are validated by spark-submit, not the session — skip them.
_SQL_PREFIX = "spark.sql."


@pytest.fixture(scope="module")
def conf_key_known(spark):
    # SQLConf.containsConfigKey covers undocumented/legacy entries that
    # `SET -v` (documented-only) omits, e.g. legacy.parquet.nanosAsLong.
    # Spark 4 ships no static forwarder for the companion, so reach the
    # singleton via MODULE$.
    jvm = spark._jvm
    mod = (
        jvm.java.lang.Class.forName("org.apache.spark.sql.internal.SQLConf$")
        .getField("MODULE$")
        .get(None)
    )

    def known(key: str) -> bool:
        return bool(mod.containsConfigKey(key))

    return known


def _sql_keys(conf: dict) -> list[str]:
    return [k for k in conf if k.startswith(_SQL_PREFIX)]


def test_default_conf_sql_keys_exist(spark, conf_key_known):
    unknown = [k for k in _sql_keys(DEFAULT_CONF) if not conf_key_known(k)]
    assert unknown == [], f"DEFAULT_CONF keys unknown to SQLConf: {unknown}"


def test_cluster_conf_sql_keys_exist(spark, conf_key_known):
    unknown = [k for k in _sql_keys(cluster_conf()) if not conf_key_known(k)]
    assert unknown == [], f"cluster_conf keys unknown to SQLConf: {unknown}"


def test_runtime_bloom_filter_enabled(spark):
    # The posture claims runtime bloom-filter join pruning is on; assert
    # the session actually reports it (would fail if the key regressed to
    # the nonexistent 'runtimeFilter' spelling and the default ever flips).
    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"


def test_bench_isolated_loadavg_precondition(monkeypatch, tmp_path, capsys):
    # VERDICT r16 #3: an isolated median taken under host-level steal must
    # be stamped and flagged, never silently anchor-grade. Drive main()
    # with a stubbed runner and a stubbed loadavg above/below threshold.
    import json as _json
    import sys as _sys

    sys_path_root = str(tmp_path)  # noqa: F841  (tmp_path used for output)
    import tools.bench_isolated as bi

    monkeypatch.setattr(
        bi, "run_one", lambda key, reps: {"median": 1.0, "reps": [1.0], "loadavg_before": 9.9}
    )

    out = tmp_path / "iso.json"
    monkeypatch.setattr(_sys, "argv", ["bench_isolated.py", str(out), "1", "k1"])

    # Loaded box: warning path + stamped fields.
    monkeypatch.setattr(bi, "read_loadavg", lambda: 7.5)
    bi.main()
    doc = _json.loads(out.read_text())
    assert doc["loadavg_start"] == 7.5
    assert "ambient_warning" in doc and "NOT anchor-grade" in doc["ambient_warning"]
    assert doc["results"]["k1"]["loadavg_before"] == 9.9
    assert "WARNING" in capsys.readouterr().err

    # Quiet box: no warning key.
    monkeypatch.setattr(bi, "read_loadavg", lambda: 0.2)
    bi.main()
    doc = _json.loads(out.read_text())
    assert doc["loadavg_start"] == 0.2
    assert "ambient_warning" not in doc
