"""O6 observability: reconciliation counters mirror the reference's
metric family (src/utils/metrics/reconciliation.py:22-200) and fold the
runner's per-table results — asserted end-to-end through
ParallelReconciler on real fixture tables."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.metrics import ReconciliationMetrics
from sqlserver_pg_cdc_spark.runner import ParallelReconciler
from tests.conftest import load


def test_record_run_counters_direct():
    m = ReconciliationMetrics()
    m.record_run(
        "orders",
        "success",
        2.5,
        {"source_count": 100, "target_count": 90, "match": False,
         "checksum_match": False},
    )
    m.record_run("orders", "success", 1.0,
                 {"source_count": 90, "target_count": 90, "match": True})
    m.record_run("orders", "failed", 0.1, {})
    t = {"table_name": "orders"}
    assert m.runs_total.get({**t, "status": "success"}) == 2
    assert m.runs_total.get({**t, "status": "failed"}) == 1
    assert m.row_count_mismatch_total.get(t) == 1
    assert m.checksum_mismatch_total.get(t) == 1
    assert m.rows_compared_total.get(t) == 100 + 90 + 90 + 90
    assert m.row_count_difference.get(t) == 0  # last run matched
    assert m.duration_seconds.totals[(("table_name", "orders"),)] == 3


def test_render_text_exposition_format():
    m = ReconciliationMetrics()
    m.record_run("t1", "success", 3.0,
                 {"source_count": 10, "target_count": 8, "match": False})
    text = m.render_text()
    assert '# TYPE reconciliation_runs_total counter' in text
    assert 'reconciliation_runs_total{status="success",table_name="t1"} 1' in text
    assert 'reconciliation_row_count_difference{table_name="t1"} 2' in text
    # histogram: 3.0s lands in the le=5 bucket cumulatively, not le=1
    assert 'reconciliation_duration_seconds_bucket{le="1",table_name="t1"} 0' in text
    assert 'reconciliation_duration_seconds_bucket{le="5",table_name="t1"} 1' in text
    assert 'reconciliation_duration_seconds_count{table_name="t1"} 1' in text


def test_runner_records_metrics_end_to_end(spark):
    """Counts-mismatch + checksum-mismatch + a failing table, all
    reflected in the counters after a real parallel run."""
    m = ReconciliationMetrics()
    r = ParallelReconciler(spark, max_workers=2, metrics=m)

    def ok_pair():
        df = load(spark, "nation")
        return df, df

    def drift_pair():
        df = load(spark, "region")
        return df, df.filter(F.col("r_regionkey") != 0)

    def boom_pair():
        raise RuntimeError("source unreachable")

    results = r.reconcile_tables(
        {"nation": ok_pair, "region": drift_pair, "broken": boom_pair},
        validate_checksums=True,
    )
    by = {res.table: res for res in results}
    assert by["nation"].status == "success" and by["nation"].result["match"]
    assert not by["region"].result["match"]
    assert by["broken"].status == "failed"

    assert m.runs_total.get({"table_name": "nation", "status": "success"}) == 1
    assert m.runs_total.get({"table_name": "broken", "status": "failed"}) == 1
    assert m.row_count_mismatch_total.get({"table_name": "region"}) == 1
    assert m.checksum_mismatch_total.get({"table_name": "region"}) == 1
    assert m.checksum_mismatch_total.get({"table_name": "nation"}) == 0
    assert m.rows_compared_total.get({"table_name": "nation"}) > 0
    assert m.comparison_rate.get({"table_name": "nation"}) > 0
    # a scrape-able snapshot exists for every family
    text = m.render_text()
    for name in (
        "reconciliation_runs_total",
        "reconciliation_duration_seconds",
        "reconciliation_rows_compared_total",
    ):
        assert name in text


def test_prometheus_export_optional():
    m = ReconciliationMetrics()
    m.record_run("t", "success", 1.0, {"source_count": 1, "target_count": 1, "match": True})
    try:
        import prometheus_client  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="prometheus_client"):
            m.to_prometheus()
    else:
        reg = m.to_prometheus()
        sample = {
            s.name: s.value
            for fam in reg.collect()
            for s in fam.samples
            if s.name == "reconciliation_runs_total_total" or s.name == "reconciliation_runs_total"
        }
        assert sample


def test_normalize_query_type_bounded_labels():
    from sqlserver_pg_cdc_spark.metrics import normalize_query_type

    assert normalize_query_type("  select * from t") == "SELECT"
    assert normalize_query_type("INSERT INTO t VALUES (1)") == "INSERT"
    assert normalize_query_type("update t set x=1") == "UPDATE"
    assert normalize_query_type("DELETE FROM t") == "DELETE"
    assert normalize_query_type("MERGE INTO t USING s") == "OTHER"
    assert normalize_query_type("") == "OTHER"
    assert normalize_query_type(None) == "OTHER"


def test_vault_ref_parse_and_fake_client(monkeypatch):
    """Vault path parity without hvac installed: the config placeholder
    syntax parses, and from_vault drives the kv-v2 API shape correctly
    against a faked hvac module."""
    import sys
    import types

    from sqlserver_pg_cdc_spark.credentials import from_vault, parse_vault_ref

    assert parse_vault_ref("${vault:secret/database:sqlserver_user}") == (
        "secret", "database", "sqlserver_user"
    )
    with pytest.raises(ValueError):
        parse_vault_ref("plain_value")
    with pytest.raises(ValueError):
        parse_vault_ref("${vault:nopath}")

    calls = {}

    class _KV2:
        def read_secret_version(self, path, mount_point):
            calls["path"], calls["mount"] = path, mount_point
            return {"data": {"data": {"username": "u1", "password": "p1"}}}

    class _Client:
        def __init__(self, url, token):
            calls["url"], calls["token"] = url, token
            self.secrets = types.SimpleNamespace(
                kv=types.SimpleNamespace(v2=_KV2())
            )

    fake = types.ModuleType("hvac")
    fake.Client = _Client
    monkeypatch.setitem(sys.modules, "hvac", fake)
    monkeypatch.setenv("VAULT_ADDR", "http://vault:8200")
    monkeypatch.setenv("VAULT_TOKEN", "tok")
    creds = from_vault("database", mount="secret")
    assert (creds.user, creds.password) == ("u1", "p1")
    assert calls == {
        "url": "http://vault:8200", "token": "tok",
        "path": "database", "mount": "secret",
    }
    assert "p1" not in repr(creds)


def test_driver_window_order_rejects_unknown_names():
    """A typo in _DRIVER_WINDOW_FIRST must fail fast, not silently
    shrink the driver's correctness-gate window."""
    import pytest

    from sqlserver_pg_cdc_spark.workload import (
        _DRIVER_WINDOW_FIRST,
        _driver_window_order,
    )

    full = {n: object() for n in _DRIVER_WINDOW_FIRST}
    ordered = _driver_window_order(dict(full))
    assert list(ordered)[: len(_DRIVER_WINDOW_FIRST)] == _DRIVER_WINDOW_FIRST
    missing = dict(full)
    missing.pop(_DRIVER_WINDOW_FIRST[0])
    with pytest.raises(KeyError):
        _driver_window_order(missing)
