"""Repair generation, report assembly, state tracker, runner, CLI."""

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.diff import diff_tables
from sqlserver_pg_cdc_spark.operators.repair import (
    format_value,
    generate_repair_script,
    quote_identifier,
    validate_identifier,
)
from sqlserver_pg_cdc_spark.operators.report import (
    calculate_severity,
    format_report_console,
    generate_report,
    report_to_csv,
)
from sqlserver_pg_cdc_spark.runner import ParallelReconciler, reconcile_table
from sqlserver_pg_cdc_spark.state import ChecksumState, IncrementalStateTracker
from tests.conftest import load


# --- repair ---------------------------------------------------------------

def test_repair_script_roundtrip_on_duckdb(spark, duck, tmp_path):
    """Property from SURVEY §7 step 4: applying the generated script to the
    target replica empties the diff. We replay it on a DuckDB copy."""
    src = load(spark, "nation")
    tgt = (
        src.filter(F.col("n_nationkey") % 7 != 0)  # MISSING
        .withColumn(
            "n_name",
            F.when(F.col("n_nationkey") % 5 == 0, F.lit("MUTATED")).otherwise(
                F.col("n_name")
            ),
        )
        .unionByName(  # EXTRA
            src.filter(F.col("n_nationkey") % 11 == 0).withColumn(
                "n_nationkey", F.col("n_nationkey") + 1000
            )
        )
    )
    d = diff_tables(src, tgt, ["n_nationkey"], include_values=True)
    script = generate_repair_script(d, ["n_nationkey"], "nation_tgt")
    assert script.startswith("-- Repair script for nation_tgt")
    assert "BEGIN;" in script and script.rstrip().endswith("COMMIT;")

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE nation_src AS SELECT * FROM "
        "'/root/testdata/sf0.001/nation.parquet'"
    )
    con.execute(
        """CREATE TABLE nation_tgt AS
           SELECT CASE WHEN n_nationkey % 11 = 0 AND dup THEN n_nationkey + 1000
                       ELSE n_nationkey END AS n_nationkey,
                  CASE WHEN NOT dup AND n_nationkey % 5 = 0 THEN 'MUTATED' ELSE n_name END AS n_name,
                  n_regionkey
           FROM (SELECT n.*, d.dup FROM nation_src n,
                 (SELECT false AS dup UNION ALL SELECT true) d)
           WHERE (NOT dup AND n_nationkey % 7 <> 0) OR (dup AND n_nationkey % 11 = 0)"""
    )
    con.execute(script)
    # after repair: target == source
    assert con.execute(
        """SELECT count(*) FROM (
             SELECT * FROM nation_src EXCEPT SELECT * FROM nation_tgt
             UNION ALL
             SELECT * FROM nation_tgt EXCEPT SELECT * FROM nation_src)"""
    ).fetchone()[0] == 0


def test_identifier_safety():
    assert quote_identifier("ok_name") == '"ok_name"'
    assert quote_identifier("ok_name", "sqlserver") == "[ok_name]"
    for bad in ("a; DROP TABLE x", "1abc", 'we"ird', ""):
        with pytest.raises(ValueError):
            validate_identifier(bad)


def test_format_value_dialects():
    import datetime as dt

    assert format_value(None) == "NULL"
    assert format_value("o'hara") == "'o''hara'"
    assert format_value(True) == "TRUE"
    assert format_value(True, "sqlserver") == "1"
    assert format_value(3.5) == "3.5"
    ts = dt.datetime(2024, 1, 2, 3, 4, 5)
    assert format_value(ts) == "'2024-01-02T03:04:05'"
    assert format_value(ts, "sqlserver") == "'2024-01-02 03:04:05'"


# --- report ---------------------------------------------------------------

def test_severity_boundaries():
    assert calculate_severity(0, 0) == "LOW"
    assert calculate_severity(0, 5) == "CRITICAL"
    assert calculate_severity(10000, 9) == "LOW"       # 0.09%
    assert calculate_severity(10000, 10) == "MEDIUM"   # 0.1%
    assert calculate_severity(10000, 99) == "MEDIUM"   # 0.99%
    assert calculate_severity(10000, 100) == "HIGH"    # 1%
    assert calculate_severity(10000, 999) == "HIGH"
    assert calculate_severity(10000, 1000) == "CRITICAL"  # 10%


def test_generate_report_shapes():
    empty = generate_report([])
    assert empty["status"] == "NO_DATA"

    ok = generate_report(
        [{"table": "t1", "source_count": 10, "target_count": 10, "match": True}]
    )
    assert ok["status"] == "PASS" and ok["tables_matched"] == 1
    assert "consistent" in ok["summary"]

    bad = generate_report(
        [
            {
                "table": "t1",
                "source_count": 100,
                "target_count": 95,
                "difference": -5,
                "match": False,
            },
            {
                "table": "t2",
                "source_count": 10,
                "target_count": 10,
                "match": True,
                "checksum_match": False,
                "source_checksum": "a",
                "target_checksum": "b",
            },
        ]
    )
    assert bad["status"] == "FAIL"
    assert bad["tables_mismatched"] == 2
    types = {d["issue_type"] for d in bad["discrepancies"]}
    assert types == {"ROW_COUNT_MISMATCH", "CHECKSUM_MISMATCH"}
    assert any("missing 5 rows" in r for r in bad["recommendations"])
    assert any("corruption" in r.lower() for r in bad["recommendations"])
    # formatters don't crash and carry the data
    assert "t1" in report_to_csv(bad)
    assert "RECONCILIATION REPORT" in format_report_console(bad)


# --- state tracker --------------------------------------------------------

def test_state_tracker_roundtrip(tmp_path):
    tr = IncrementalStateTracker(str(tmp_path))
    assert tr.load("customer") is None
    st = tr.record_run("customer", "abc123", 150, mode="full")
    got = tr.load("customer")
    assert got == st
    tr.record_run("customer", "def456", 151, mode="delta")
    got2 = tr.load("customer")
    assert got2.checksum == "def456" and got2.mode == "delta"
    assert tr.tables() == ["customer"]


# --- runner ---------------------------------------------------------------

def test_reconcile_table_full(spark):
    src = load(spark, "customer")
    tgt = src.filter(F.col("c_custkey") % 50 != 0)
    res = reconcile_table(
        src, tgt, "customer", pk_cols=["c_custkey"], validate_checksums=True,
        row_level=True,
    )
    assert res["match"] is False and res["difference"] < 0
    assert res["checksum_match"] is False
    assert res["row_level"]["missing"] > 0
    assert res["row_level"]["extra"] == 0 and res["row_level"]["modified"] == 0


def test_parallel_reconciler(spark):
    pairs = {
        t: (lambda t=t: (load(spark, t), load(spark, t)))
        for t in ("region", "nation", "supplier")
    }
    rec = ParallelReconciler(spark, max_workers=3)
    results = rec.reconcile_tables(pairs)
    assert len(results) == 3
    assert all(r.status == "success" for r in results)
    assert all(r.result["match"] for r in results)
    stats = ParallelReconciler.stats(results)
    assert stats["successful"] == 3 and stats["failed"] == 0


def test_parallel_reconciler_captures_errors(spark):
    def boom():
        raise RuntimeError("cannot load")

    rec = ParallelReconciler(spark, max_workers=2)
    results = rec.reconcile_tables({"bad": boom, "region": lambda: (load(spark, "region"), load(spark, "region"))})
    by_name = {r.table: r for r in results}
    assert by_name["bad"].status == "failed" and "cannot load" in by_name["bad"].error
    assert by_name["region"].status == "success"


# --- CLI (subprocess, reference e2e style) --------------------------------

def test_cli_run_match_and_mismatch(tmp_path):
    env_dir = "/root/testdata/sf0.001"
    out = tmp_path / "report.json"
    r = subprocess.run(
        [
            sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "run",
            "--source-dir", env_dir, "--target-dir", env_dir,
            "--tables", "region", "nation",
            "--format", "json", "--output", str(out),
        ],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(out.read_text())
    assert report["status"] == "PASS" and report["total_tables"] == 2


def test_parallel_reconciler_fail_fast_cancels(spark):
    """fail_fast: after the first failure, queued tables are cancelled."""
    import time as _time

    order = []

    def bad():
        order.append("bad")
        raise RuntimeError("first failure")

    def slow_ok():
        order.append("ok")
        _time.sleep(0.5)
        d = load(spark, "region")
        return d, d

    rec = ParallelReconciler(spark, max_workers=1, fail_fast=True)
    results = {r.table: r for r in rec.reconcile_tables(
        {"bad": bad, "later1": slow_ok, "later2": slow_ok})}
    assert results["bad"].status == "failed"
    cancelled = [t for t in ("later1", "later2")
                 if results[t].status == "failed" and "cancelled" in (results[t].error or "")]
    assert cancelled, f"expected at least one cancelled table: { {t: (results[t].status, results[t].error) for t in results} }"


def test_diff_finds_exactly_injected_discrepancies(spark):
    """Completeness: K injected discrepancies -> exactly K diff rows of
    the right types, nothing else."""
    src = load(spark, "customer")
    keys = [r[0] for r in src.select("c_custkey").orderBy("c_custkey").limit(9).collect()]
    drop, mutate, add_base = keys[0:3], keys[3:6], keys[6:9]
    tgt = (
        src.filter(~F.col("c_custkey").isin(drop))
        .withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey").isin(mutate), F.col("c_acctbal") + 7.5)
            .otherwise(F.col("c_acctbal")),
        )
        .unionByName(
            src.filter(F.col("c_custkey").isin(add_base)).withColumn(
                "c_custkey", F.col("c_custkey") + 10_000_000
            )
        )
    )
    d = diff_tables(src, tgt, ["c_custkey"]).collect()
    by_type = {}
    for r in d:
        by_type.setdefault(r["diff_type"], set()).add(r["c_custkey"])
    assert by_type["MISSING"] == set(drop)
    assert by_type["MODIFIED"] == set(mutate)
    assert by_type["EXTRA"] == {k + 10_000_000 for k in add_base}
    assert len(d) == 9
