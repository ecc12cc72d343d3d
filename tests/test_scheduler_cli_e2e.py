"""Scheduler/cron, retry, credentials, incremental CLI mode, and the
capstone end-to-end flow: CDC replication then reconciliation."""

import datetime as dt
import json
import os
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.credentials import DbCredentials, from_env, resolve
from sqlserver_pg_cdc_spark.scheduler import (
    CronSchedule,
    Scheduler,
    retry_with_backoff,
)
from tests.conftest import load


# --- cron -----------------------------------------------------------------

def test_cron_parse_and_match():
    c = CronSchedule.parse("*/15 9-17 * * 1-5")
    assert c.matches(dt.datetime(2026, 8, 12, 9, 0))   # Wednesday
    assert c.matches(dt.datetime(2026, 8, 12, 17, 45))
    assert not c.matches(dt.datetime(2026, 8, 12, 18, 0))  # after hours
    assert not c.matches(dt.datetime(2026, 8, 15, 10, 0))  # Saturday
    assert not c.matches(dt.datetime(2026, 8, 12, 9, 7))   # off-step minute


def test_cron_next_fire():
    c = CronSchedule.parse("30 2 * * *")
    nxt = c.next_fire(dt.datetime(2026, 8, 12, 2, 30))
    assert nxt == dt.datetime(2026, 8, 13, 2, 30)  # strictly after


def test_cron_rejects_bad_specs():
    for bad in ("* * * *", "61 * * * *", "* 25 * * *", "x * * * *"):
        with pytest.raises(ValueError):
            CronSchedule.parse(bad)


def test_scheduler_interval_fires_in_order():
    fired = []
    s = Scheduler()
    s.add_interval_job("a", lambda: fired.append("a"), seconds=10)
    s.add_interval_job("b", lambda: fired.append("b"), seconds=25)
    clock = {"t": dt.datetime(2026, 1, 1)}

    def now():
        return clock["t"]

    def sleep(sec):
        clock["t"] += dt.timedelta(seconds=sec)

    s.run(max_fires=5, now_fn=now, sleep_fn=sleep)
    assert fired == ["a", "a", "b", "a", "a"]  # 10,20,25,30,40


# --- retry ----------------------------------------------------------------

def test_retry_succeeds_after_failures():
    calls = {"n": 0}
    delays = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return "ok"

    out = retry_with_backoff(flaky, retries=5, base_delay=1.0, jitter=0.0,
                             sleep_fn=delays.append)
    assert out == "ok" and calls["n"] == 3
    assert delays == [1.0, 2.0]  # exponential base 2


def test_retry_respects_classifier_and_budget():
    def always_value_error():
        raise ValueError("permanent")

    with pytest.raises(ValueError):
        retry_with_backoff(
            always_value_error,
            retries=5,
            retryable=lambda e: isinstance(e, ConnectionError),
            sleep_fn=lambda s: None,
        )

    calls = {"n": 0}

    def always_conn_error():
        calls["n"] += 1
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        retry_with_backoff(always_conn_error, retries=2, sleep_fn=lambda s: None)
    assert calls["n"] == 3  # initial + 2 retries


# --- credentials ----------------------------------------------------------

def test_credentials_from_env(monkeypatch):
    monkeypatch.setenv("SRC_USER", "u1")
    monkeypatch.setenv("SRC_PASSWORD", "s3cret")
    c = from_env("SRC")
    assert c == DbCredentials("u1", "s3cret")
    assert "s3cret" not in repr(c)  # never leaked in repr

    monkeypatch.delenv("SRC_PASSWORD")
    with pytest.raises(ValueError, match="SRC_PASSWORD"):
        from_env("SRC")


def test_credentials_vault_gated():
    with pytest.raises(RuntimeError, match="hvac"):
        resolve("X", use_vault=True)


# --- incremental CLI mode -------------------------------------------------

def test_cli_incremental_state_roundtrip(tmp_path):
    env_dir = "/root/testdata/sf0.001"
    state = tmp_path / "state"
    out = tmp_path / "r.json"
    cmd = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "run",
        "--source-dir", env_dir, "--target-dir", env_dir,
        "--tables", "events", "--incremental",
        "--state-dir", str(state), "--change-col", "ts",
        "--format", "json", "--output", str(out),
    ]
    r1 = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-1500:]
    st = json.loads((state / "events.json").read_text())
    assert st["mode"] == "full" and st["row_count"] == 1000

    # second run: prior state exists -> delta mode; identical dirs -> PASS
    r2 = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-1500:]
    st2 = json.loads((state / "events.json").read_text())
    assert st2["mode"] == "delta"
    report = json.loads(out.read_text())
    assert report["status"] == "PASS"


# --- capstone: replicate via CDC, then reconcile --------------------------

def test_e2e_replicate_then_reconcile(spark, tmp_path):
    """The reference's whole story in one flow: a change stream is
    applied to a target (soft deletes and all), then reconciliation
    proves source-active-rows == target-active-rows."""
    from pyspark.sql import types as T

    from sqlserver_pg_cdc_spark.operators.diff import diff_tables
    from sqlserver_pg_cdc_spark.runner import reconcile_table
    from sqlserver_pg_cdc_spark.streaming.pipeline import CdcPipeline

    payload = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    now_ms = int(time.time() * 1000)
    events = []
    lsn = 0
    # 50 inserts, 10 updates, 5 deletes
    for i in range(50):
        lsn += 1
        events.append({"op": "c", "lsn": lsn, "ts_ms": now_ms,
                       "before": None, "after": {"id": i, "v": f"v{i}"}})
    for i in range(10):
        lsn += 1
        events.append({"op": "u", "lsn": lsn, "ts_ms": now_ms,
                       "before": None, "after": {"id": i, "v": f"v{i}-updated"}})
    for i in range(45, 50):
        lsn += 1
        events.append({"op": "d", "lsn": lsn, "ts_ms": now_ms,
                       "before": {"id": i, "v": f"v{i}"}, "after": None})

    spool = tmp_path / "spool"
    os.makedirs(spool)
    with open(spool / "changes.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    p = CdcPipeline(spark, str(spool), str(tmp_path / "tgt"),
                    str(tmp_path / "ckpt"), payload, ["id"])
    p.run_available_now()

    # source truth = final state computed independently
    rows = [(i, f"v{i}-updated" if i < 10 else f"v{i}") for i in range(45)]
    source = spark.createDataFrame(rows, "id long, v string")
    target_active = p.active_rows().select("id", "v")

    res = reconcile_table(source, target_active, "t", pk_cols=["id"],
                          validate_checksums=True, row_level=True)
    assert res["match"] and res["checksum_match"]
    assert res["row_level"] == {"missing": 0, "extra": 0, "modified": 0}
    assert diff_tables(source, target_active, ["id"]).count() == 0


# --- review-fix regressions ----------------------------------------------

def test_cron_accepts_dow_seven_as_sunday():
    c = CronSchedule.parse("0 0 * * 7")
    assert c.matches(dt.datetime(2026, 8, 16, 0, 0))  # a Sunday
    assert not c.matches(dt.datetime(2026, 8, 17, 0, 0))  # Monday


def test_scheduler_duplicate_names_both_fire():
    fired = []
    s = Scheduler()
    s.add_interval_job("sync", lambda: fired.append("A"), seconds=10)
    s.add_interval_job("sync", lambda: fired.append("B"), seconds=15)
    clock = {"t": dt.datetime(2026, 1, 1)}
    s.run(max_fires=4, now_fn=lambda: clock["t"],
          sleep_fn=lambda sec: clock.__setitem__("t", clock["t"] + dt.timedelta(seconds=sec)))
    assert "A" in fired and "B" in fired  # 10,15,20,30


def test_repair_nan_infinity_literals():
    from sqlserver_pg_cdc_spark.operators.repair import format_value

    assert format_value(float("nan")) == "'NaN'"
    assert format_value(float("inf")) == "'Infinity'"
    assert format_value(float("-inf")) == "'-Infinity'"
    assert format_value(float("nan"), "sqlserver") == "NULL"


def test_evolution_rejects_dropped_columns(spark):
    from pyspark.sql import types as T

    from sqlserver_pg_cdc_spark.operators.evolution import align_to_evolved

    df = spark.createDataFrame([(1, "a", 2)], "id long, name string, extra int")
    target = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    with pytest.raises(ValueError, match="dropped columns"):
        align_to_evolved(df, target)


def test_jdbc_poll_query_rejects_injection():
    from sqlserver_pg_cdc_spark.sources.jdbc import incremental_poll_query

    # legit CDC identifiers still work
    q = incremental_poll_query("cdc.t_CT", "__$start_lsn", "0x0AB'),(",  # quote in LSN
                               order_columns=["__$start_lsn", "__$seqval"])
    assert "''" in q  # escaped, not raw
    with pytest.raises(ValueError):
        incremental_poll_query("t; DROP TABLE x", "lsn", 1)
    with pytest.raises(ValueError):
        incremental_poll_query("t", "lsn or 1=1", 1)


def test_cron_dom_dow_or_semantics():
    """vixie cron: both day fields restricted -> OR; one wildcard -> AND."""
    both = CronSchedule.parse("0 0 13 * 5")  # 13th OR Friday
    assert both.matches(dt.datetime(2026, 8, 13, 0, 0))  # the 13th (a Thursday)
    assert both.matches(dt.datetime(2026, 8, 14, 0, 0))  # a Friday, not 13th
    assert not both.matches(dt.datetime(2026, 8, 15, 0, 0))  # Saturday 15th
    only_dow = CronSchedule.parse("0 0 * * 5")  # Fridays only
    assert not only_dow.matches(dt.datetime(2026, 8, 13, 0, 0))


def test_scheduler_survives_job_failure():
    fired = []

    def bad():
        fired.append("bad")
        raise RuntimeError("job exploded")

    clock = {"t": dt.datetime(2026, 1, 1)}
    s = Scheduler()
    s.add_interval_job("bad", bad, seconds=5)
    s.add_interval_job("good", lambda: fired.append("good"), seconds=7)
    s.run(max_fires=4, now_fn=lambda: clock["t"],
          sleep_fn=lambda sec: clock.__setitem__("t", clock["t"] + dt.timedelta(seconds=sec)))
    assert "good" in fired and fired.count("bad") >= 2  # loop survived failures


def test_check_referential_ignores_null_fks(spark):
    from sqlserver_pg_cdc_spark.operators.quality import check_referential

    child = spark.createDataFrame([(1,), (None,), (99,)], "fk int")
    parent = spark.createDataFrame([(1,)], "pk int")
    [r] = check_referential(child, parent, ["fk"], ["pk"]).collect()
    assert r["violations"] == 1  # only the 99 orphan; NULL satisfies the FK


def test_salted_join_rejects_outer_modes(spark):
    from sqlserver_pg_cdc_spark.operators.skew import salted_broadcast_join

    a = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="salted_broadcast_join supports"):
        salted_broadcast_join(a, a, ["k"], how="full")


def test_simhash_banding_guarantee(spark):
    """Adversarial pigeonhole case: exactly bands-1 differing bits spread
    one-per-band MUST still collide on the remaining band."""
    from sqlserver_pg_cdc_spark.operators import dedup as DD

    # build two token sets whose simhash differs in <= 5 bits is hard to
    # force directly; instead verify the constant relationship the
    # guarantee depends on
    assert DD._SIMHASH_BANDS * DD._SIMHASH_BAND_BITS == DD.SIMHASH_BITS
    assert DD._SIMHASH_BANDS - 1 >= 5  # default max_hamming is covered


def test_cli_metrics_out(tmp_path):
    """--metrics-out writes a Prometheus text snapshot covering the run
    (O6 through the CLI)."""
    env_dir = "/root/testdata/sf0.001"
    out = tmp_path / "r.json"
    mfile = tmp_path / "metrics.prom"
    cmd = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "run",
        "--source-dir", env_dir, "--target-dir", env_dir,
        "--tables", "nation", "region",
        "--format", "json", "--output", str(out),
        "--metrics-out", str(mfile),
    ]
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    text = mfile.read_text()
    assert 'reconciliation_runs_total{status="success",table_name="nation"} 1' in text
    assert 'reconciliation_runs_total{status="success",table_name="region"} 1' in text
    assert "reconciliation_duration_seconds_count" in text
    assert "reconciliation_rows_compared_total" in text


def test_cli_stream_subcommand(tmp_path):
    """O5 + St1 through the CLI: spool -> `stream` subcommand ->
    applied parquet target; a second invocation resumes the checkpoint
    and changes nothing."""
    import json as _json

    spool = tmp_path / "spool"
    spool.mkdir()
    events = [
        {"op": "c", "lsn": 1, "ts_ms": 1700000000000,
         "before": None, "after": {"id": 1, "name": "a", "amount": 1.5}},
        {"op": "d", "lsn": 2, "ts_ms": 1700000001000,
         "before": {"id": 1, "name": "a", "amount": 1.5}, "after": None},
        {"op": "c", "lsn": 3, "ts_ms": 1700000002000,
         "before": None, "after": {"id": 2, "name": "b", "amount": 2.5}},
    ]
    with open(spool / "batch.json", "w") as f:
        for e in events:
            f.write(_json.dumps(e) + "\n")
    cmd = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "stream",
        "--spool-dir", str(spool),
        "--target-dir", str(tmp_path / "tgt"),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--payload-schema", "id LONG, name STRING, amount DOUBLE",
        "--pk-columns", "id",
        "--max-files-per-trigger", "1",
    ]
    r1 = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    out = _json.loads(r1.stdout.strip().splitlines()[-1])
    assert out["applied_target_rows"] == 2  # id=1 soft-deleted, id=2 live

    r2 = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    out2 = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["applied_target_rows"] == 2


def test_cli_stream_transactional(tmp_path):
    """`stream --transactional`: a transaction split across two spool
    files (micro-batches) applies all-or-nothing through the CLI."""
    import json as _json

    spool = tmp_path / "spool"
    spool.mkdir()

    def ev(lsn, op, row=None, txn=None, count=None):
        return _json.dumps({
            "op": op, "lsn": lsn, "ts_ms": 1700000000000 + lsn,
            "before": None, "after": row,
            "transaction": {"id": txn, "event_count": count} if txn else None,
        })

    (spool / "0.json").write_text(
        ev(1, "c", {"id": 1, "name": "a", "amount": 1.0}, "T1") + "\n"
    )
    (spool / "1.json").write_text(
        "\n".join([
            ev(2, "c", {"id": 2, "name": "b", "amount": 2.0}, "T1"),
            ev(3, "t", None, "T1", 2),
        ])
    )
    cmd = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "stream",
        "--spool-dir", str(spool),
        "--target-dir", str(tmp_path / "tgt"),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--payload-schema", "id LONG, name STRING, amount DOUBLE",
        "--pk-columns", "id",
        "--max-files-per-trigger", "1",
        "--transactional",
    ]
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["applied_target_rows"] == 2


def test_cli_decontam(tmp_path):
    """End-to-end decontamination through the CLI: docs overlapping the
    eval set are dropped from the clean output; the report parquet
    carries per-doc hit counts."""
    import json as _json

    import duckdb as _duckdb

    corpus = str(tmp_path / "corpus.parquet")
    eval_p = str(tmp_path / "eval.parquet")
    _duckdb.sql(
        "COPY (SELECT * FROM (VALUES "
        "(1, 'the quick brown fox jumps over the lazy dog'), "
        "(2, 'completely unrelated text about something else entirely here'), "
        "(3, 'another clean document with no overlap at all today')"
        ") t(doc_id, text)) TO '" + corpus + "' (FORMAT PARQUET)"
    )
    _duckdb.sql(
        "COPY (SELECT * FROM (VALUES "
        "(100, 'quick brown fox jumps')"
        ") t(doc_id, text)) TO '" + eval_p + "' (FORMAT PARQUET)"
    )
    out = str(tmp_path / "clean")
    report = str(tmp_path / "report")
    r = subprocess.run(
        [sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "decontam",
         "--input", corpus, "--eval-set", eval_p,
         "--k", "3", "--output", out, "--report-out", report],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = _json.loads(r.stdout.strip().splitlines()[-1])
    assert stats == {"input_docs": 3, "clean_docs": 2,
                     "contaminated_docs": 1, "k": 3, "min_hits": 1}
    clean_ids = {x[0] for x in _duckdb.sql(f"SELECT doc_id FROM '{out}/*.parquet'").fetchall()}
    assert clean_ids == {2, 3}
    rep = {x[0]: x[1] for x in _duckdb.sql(
        f"SELECT doc_id, n_eval_hits FROM '{report}/*.parquet'").fetchall()}
    assert rep[1] >= 1 and rep[2] == 0


def test_cli_corpus_dedup(tmp_path):
    """End-to-end corpus dedup through the CLI: planted near-dups are
    clustered and each cluster keeps exactly one survivor."""
    import json as _json

    import duckdb as _duckdb

    src = str(tmp_path / "docs.parquet")
    # corpus with near-identical copies of the first 5 docs
    _duckdb.sql(
        "COPY (SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet' "
        " UNION ALL "
        " SELECT doc_id + 100000, text || ' tiny suffix' "
        " FROM '/root/testdata/sf0.001/documents.parquet' WHERE doc_id < 5) "
        f"TO '{src}' (FORMAT PARQUET)"
    )
    out = str(tmp_path / "kept.parquet")
    stats_f = tmp_path / "stats.json"
    cmd = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "corpus",
        "--input", src, "--output", out,
        "--threshold", "0.5", "--stats-out", str(stats_f),
    ]
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = _json.loads(stats_f.read_text())
    assert stats["input_docs"] == 505
    # each planted near-dup pair collapses to one survivor
    assert stats["removed_docs"] >= 5
    assert stats["kept_docs"] == stats["input_docs"] - stats["removed_docs"]
    kept_ids = {r[0] for r in _duckdb.sql(f"SELECT doc_id FROM '{out}/*.parquet'").fetchall()}
    for i in range(5):
        # the lower id survives; its planted copy is gone
        assert i in kept_ids and (i + 100000) not in kept_ids


def test_cli_rollup_subcommand(tmp_path, spark):
    """Two delta refreshes through the rollup CLI must equal the
    one-shot aggregate over the union."""
    import json as _json

    d1 = tmp_path / "delta1"
    d2 = tmp_path / "delta2"
    rows = [(i % 3, float(i)) for i in range(100)]
    full = spark.createDataFrame(rows, "k int, value double")
    full.filter("value < 50").write.parquet(str(d1))
    full.filter("value >= 50").write.parquet(str(d2))
    state = tmp_path / "state"
    out = tmp_path / "agg"
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "rollup",
        "--state-dir", str(state), "--key-columns", "k",
        "--value-col", "value", "--idempotent", "--output", str(out),
    ]
    r1 = subprocess.run(
        base + ["--input", str(d1), "--batch-id", "0"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = subprocess.run(
        base + ["--input", str(d2), "--batch-id", "1"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert _json.loads(r2.stdout.strip().splitlines()[-1])["groups"] == 3

    from sqlserver_pg_cdc_spark.operators import continuous_agg as CA

    got = {r["k"]: (r["n_events"], r["total"]) for r in spark.read.parquet(str(out)).collect()}
    want = {
        r["k"]: (r["n_events"], r["total"])
        for r in CA.finalize(CA.build_state(full, ["k"], "value"), ["k"]).collect()
    }
    assert got == want


def test_cli_sketch_subcommand(tmp_path):
    """O5 + CMS through the CLI: two merge invocations over halves must
    equal one sketch over the whole stream; estimates respect the
    overestimation bound."""
    import json as _json

    import duckdb as _duck

    items = [f"t{i % 13}" for i in range(300)]
    con = _duck.connect()
    half1 = ", ".join(f"('{x}')" for x in items[:150])
    half2 = ", ".join(f"('{x}')" for x in items[150:])
    con.execute(f"COPY (SELECT * FROM (VALUES {half1}) v(tok)) TO '{tmp_path}/h1.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY (SELECT * FROM (VALUES {half2}) v(tok)) TO '{tmp_path}/h2.parquet' (FORMAT PARQUET)")
    con.execute(
        f"COPY (SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt FROM "
        f"(SELECT * FROM (VALUES {half1}) v(tok) UNION ALL SELECT * FROM (VALUES {half2}) w(tok)) GROUP BY tok) "
        f"TO '{tmp_path}/cand.parquet' (FORMAT PARQUET)"
    )
    base = [sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "sketch",
            "--item-col", "tok", "--state-dir", str(tmp_path / "state")]
    r1 = subprocess.run(base + ["--input", f"{tmp_path}/h1.parquet"],
                        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = subprocess.run(
        base + ["--input", f"{tmp_path}/h2.parquet",
                "--estimate", f"{tmp_path}/cand.parquet",
                "--output", f"{tmp_path}/est.parquet"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    out = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert out["estimated_items"] == 13
    rows = con.execute(f"SELECT * FROM '{tmp_path}/est.parquet/*.parquet'").fetchall()
    cols = [d[0] for d in con.execute(f"SELECT * FROM '{tmp_path}/est.parquet/*.parquet' LIMIT 0").description]
    est_i, exact_i = cols.index("cms_est"), cols.index("exact_cnt")
    for r in rows:
        assert r[est_i] >= r[exact_i], r


def test_cli_rollup_partitioned(tmp_path):
    """O5 + partitioned continuous-agg state through the CLI: two delta
    merges with --partitions, finalized output equals the one-shot
    aggregate."""
    import json as _json

    import duckdb as _duck

    con = _duck.connect()
    con.execute(f"COPY (SELECT (range % 5)::INT AS k, (range * 1.5)::DOUBLE AS v FROM range(0, 50)) TO '{tmp_path}/d1.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY (SELECT (range % 5)::INT AS k, (range * 1.5)::DOUBLE AS v FROM range(50, 100)) TO '{tmp_path}/d2.parquet' (FORMAT PARQUET)")
    base = [sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "rollup",
            "--state-dir", str(tmp_path / "state"),
            "--key-columns", "k", "--value-col", "v",
            "--partitions", "4", "--idempotent"]
    r1 = subprocess.run(base + ["--input", f"{tmp_path}/d1.parquet", "--batch-id", "1"],
                        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = subprocess.run(base + ["--input", f"{tmp_path}/d2.parquet", "--batch-id", "2",
                                "--output", f"{tmp_path}/final.parquet"],
                        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    got = {r[0]: (r[1], round(r[2], 6)) for r in con.execute(
        f"SELECT k, n_events, total FROM '{tmp_path}/final.parquet/*.parquet' ORDER BY k").fetchall()}
    want = {r[0]: (r[1], round(r[2], 6)) for r in con.execute(
        "SELECT (range % 5)::INT AS k, CAST(count(*) AS BIGINT), "
        "CAST(sum(CAST(range * 1.5 AS DECIMAL(18,2))) AS DOUBLE) FROM range(0, 100) GROUP BY 1 ORDER BY 1").fetchall()}
    assert got == want


def test_cli_stream_partitioned_target(tmp_path):
    """`stream --partitions N`: the target lands in the part_NNNNN/
    hash layout, reads back the same rows, and a resumed invocation
    (checkpoint replay window) changes nothing."""
    import json as _json

    spool = tmp_path / "spool"
    spool.mkdir()
    events = [
        {"op": "c", "lsn": i, "ts_ms": 1700000000000 + i,
         "before": None, "after": {"id": i, "name": f"n{i}", "amount": i * 1.5}}
        for i in range(1, 21)
    ]
    with open(spool / "batch.json", "w") as f:
        for e in events:
            f.write(_json.dumps(e) + "\n")
    cmd = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "stream",
        "--spool-dir", str(spool),
        "--target-dir", str(tmp_path / "tgt"),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--payload-schema", "id LONG, name STRING, amount DOUBLE",
        "--pk-columns", "id",
        "--partitions", "8",
    ]
    r1 = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    out = _json.loads(r1.stdout.strip().splitlines()[-1])
    assert out["applied_target_rows"] == 20
    parts = sorted(p.name for p in (tmp_path / "tgt").glob("part_*"))
    assert parts and all(p.startswith("part_") for p in parts)
    r2 = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert _json.loads(r2.stdout.strip().splitlines()[-1])["applied_target_rows"] == 20


def test_cli_corpus_substring_dedup(tmp_path):
    """`corpus --substring`: recurring k-token spans are stripped from
    every document; unique text survives; stats JSON reports removal."""
    import json as _json

    import duckdb as _duck

    shared = " ".join(f"s{i}" for i in range(12))
    con = _duck.connect()
    con.execute(f"""
        COPY (SELECT * FROM (VALUES
            (1, 'front matter {shared} closing words one'),
            (2, '{shared} something else entirely here'),
            (3, 'totally unique text with nothing shared at all')
        ) AS t(doc_id, text)) TO '{tmp_path}/docs.parquet' (FORMAT PARQUET)
    """)
    cmd = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "corpus",
        "--input", str(tmp_path / "docs.parquet"),
        "--output", str(tmp_path / "out"),
        "--substring", "--span-tokens", "8", "--min-docs", "2",
    ]
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = _json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["input_docs"] == 3 and stats["removed_tokens"] == 24
    rows = {r2[0]: r2[1] for r2 in con.execute(
        f"SELECT doc_id, text FROM '{tmp_path}/out/*.parquet'").fetchall()}
    assert rows[1] == "front matter closing words one"
    assert rows[2] == "something else entirely here"
    assert rows[3].startswith("totally unique")


def test_cli_ann_ingest_and_query(tmp_path):
    """`ann`: two ingests build the partitioned index incrementally; a
    probe of exact copies finds its sources at cosine 1."""
    import json as _json

    import duckdb as _duck

    con = _duck.connect()

    def write_vecs(path, id_pairs):
        # (stored_id, source_id): the vector is a function of source_id,
        # so a probe row (1001, 1) is an exact copy of indexed vector 1
        vals = ", ".join(
            f"({sid}, [{', '.join(str(float((src * 31 + j * 7) % 13) - 6.0) for j in range(8))}])"
            for sid, src in id_pairs
        )
        con.execute(f"COPY (SELECT * FROM (VALUES {vals}) AS t(vec_id, embedding)) TO '{path}' (FORMAT PARQUET)")

    write_vecs(tmp_path / "a.parquet", [(i, i) for i in range(0, 15)])
    write_vecs(tmp_path / "b.parquet", [(i, i) for i in range(15, 30)])
    write_vecs(tmp_path / "probe.parquet", [(1001, 1), (1017, 17)])
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "ann",
        "--state-dir", str(tmp_path / "state"),
        "--bands", "4", "--planes-per-band", "4", "--dim", "8",
        "--partitions", "8",
    ]
    r1 = subprocess.run(base + ["--ingest", str(tmp_path / "a.parquet")],
                        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert _json.loads(r1.stdout.strip().splitlines()[-1])["indexed_vectors"] == 15
    r2 = subprocess.run(
        base + ["--ingest", str(tmp_path / "b.parquet"),
                "--query", str(tmp_path / "probe.parquet"),
                "--threshold", "0.99",
                "--output", str(tmp_path / "pairs")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    out = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert out["indexed_vectors"] == 30
    pairs = con.execute(f"SELECT a, b, cosine FROM '{tmp_path}/pairs/*.parquet'").fetchall()
    found = {(a, b) for a, b, c in pairs if c > 0.9999}
    assert (1001, 1) in found and (1017, 17) in found


def test_cli_ann_ivf_mode(tmp_path):
    """`ann --mode ivf`: first run trains the epoch's centroids from the
    ingest and stores them with the state; the second run reloads the
    SAME epoch, upserts more vectors, and a probe of exact copies ranks
    its source at cosine 1 in position 1."""
    import json as _json

    import duckdb as _duck

    con = _duck.connect()

    def write_vecs(path, id_pairs):
        # period-97 pattern: all 30 corpus vectors DISTINCT (the LSH
        # test's mod-13 formula makes src 4 and 17 exact copies, which
        # would tie the top-1)
        vals = ", ".join(
            f"({sid}, [{', '.join(str(float((src * 31 + j * 7) % 97) - 48.0) for j in range(8))}])"
            for sid, src in id_pairs
        )
        con.execute(f"COPY (SELECT * FROM (VALUES {vals}) AS t(vec_id, embedding)) TO '{path}' (FORMAT PARQUET)")

    write_vecs(tmp_path / "a.parquet", [(i, i) for i in range(0, 15)])
    write_vecs(tmp_path / "b.parquet", [(i, i) for i in range(15, 30)])
    write_vecs(tmp_path / "probe.parquet", [(1001, 1), (1017, 17)])
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "ann",
        "--mode", "ivf", "--state-dir", str(tmp_path / "state"),
        "--partitions", "8", "--k", "3", "--n-probe", "2",
    ]
    r1 = subprocess.run(
        base + ["--ingest", str(tmp_path / "a.parquet"), "--train-cells", "4"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    out1 = _json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["indexed_vectors"] == 15 and out1["n_cells"] == 4
    r2 = subprocess.run(
        base + ["--ingest", str(tmp_path / "b.parquet"),
                "--query", str(tmp_path / "probe.parquet"),
                "--output", str(tmp_path / "topk")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    out2 = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["indexed_vectors"] == 30
    rows = con.execute(
        f"SELECT query_id, rank, id, cosine FROM '{tmp_path}/topk/*.parquet'"
    ).fetchall()
    top1 = {q: i for q, rk, i, c in rows if rk == 1}
    cos1 = {q: c for q, rk, i, c in rows if rk == 1}
    assert top1[1001] == 1 and cos1[1001] > 0.9999
    assert top1[1017] == 17 and cos1[1017] > 0.9999


def test_cli_ann_pq_mode_with_drift_and_rotation(tmp_path):
    """`ann --mode pq`: first run trains the epoch's codebooks and
    captures the baseline; a drift probe on the same distribution reads
    healthy; `--rotate-to` retrains into a new epoch dir that reopens
    cleanly (epoch guard sees the persisted books) and answers top-k."""
    import json as _json

    import duckdb as _duck

    con = _duck.connect()

    def write_vecs(path, id_pairs):
        vals = ", ".join(
            f"({sid}, [{', '.join(str(float((src * 31 + j * 7) % 97) - 48.0) for j in range(8))}])"
            for sid, src in id_pairs
        )
        con.execute(
            f"COPY (SELECT * FROM (VALUES {vals}) AS t(vec_id, embedding)) "
            f"TO '{path}' (FORMAT PARQUET)"
        )

    write_vecs(tmp_path / "a.parquet", [(i, i) for i in range(0, 24)])
    write_vecs(tmp_path / "probe.parquet", [(1001, 1)])
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "ann",
        "--mode", "pq", "--state-dir", str(tmp_path / "pqstate"),
        "--partitions", "8", "--m-sub", "4", "--k", "3", "--refine", "8",
    ]
    r1 = subprocess.run(
        base + ["--ingest", str(tmp_path / "a.parquet"),
                "--train-codes", "8", "--capture-baseline"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    out1 = _json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["indexed_vectors"] == 24
    assert out1["m_sub"] == 4 and out1["k_codes"] == 8
    assert out1["baseline_mean_cos"] is not None
    # same-distribution reopen: epoch guard passes, drift healthy,
    # top-k of an exact copy ranks its source first
    r2 = subprocess.run(
        base + ["--drift", "--query", str(tmp_path / "probe.parquet"),
                "--output", str(tmp_path / "pqtopk")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    out2 = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["drift"]["drifted"] is False
    rows = con.execute(
        f"SELECT query_id, rank, id, cosine FROM '{tmp_path}/pqtopk/*.parquet'"
    ).fetchall()
    top1 = {q: (i, c) for q, rk, i, c in rows if rk == 1}
    assert top1[1001][0] == 1 and top1[1001][1] > 0.9999
    # rotation: new epoch dir reopens standalone and still answers
    r3 = subprocess.run(
        base + ["--rotate-to", str(tmp_path / "pqstate2")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r3.returncode == 0, r3.stderr[-2000:]
    out3 = _json.loads(r3.stdout.strip().splitlines()[-1])
    assert out3["new_epoch_vectors"] == 24
    r4 = subprocess.run(
        [
            sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "ann",
            "--mode", "pq", "--state-dir", str(tmp_path / "pqstate2"),
            "--partitions", "8", "--k", "3", "--refine", "8",
            "--query", str(tmp_path / "probe.parquet"),
            "--output", str(tmp_path / "pqtopk2"),
        ],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r4.returncode == 0, r4.stderr[-2000:]
    rows2 = con.execute(
        f"SELECT query_id, rank, id FROM '{tmp_path}/pqtopk2/*.parquet'"
    ).fetchall()
    assert {i for q, rk, i in rows2 if rk == 1} == {1}


def test_cli_ann_ivfpq_mode_full_cycle(tmp_path):
    """`ann --mode ivfpq` (round-9 verdict item #5): the composite
    index's full shell cycle — first run trains BOTH epoch halves
    (cells + residual books) from the ingest and captures the baseline;
    a reopen passes the sha-guard, reads drift healthy, and ranks an
    exact copy's source first; `--rotate-to` retrains both halves into
    a new epoch dir that reopens standalone and still answers."""
    import json as _json

    import duckdb as _duck

    con = _duck.connect()

    def write_vecs(path, id_pairs):
        vals = ", ".join(
            f"({sid}, [{', '.join(str(float((src * 31 + j * 7) % 97) - 48.0) for j in range(8))}])"
            for sid, src in id_pairs
        )
        con.execute(
            f"COPY (SELECT * FROM (VALUES {vals}) AS t(vec_id, embedding)) "
            f"TO '{path}' (FORMAT PARQUET)"
        )

    write_vecs(tmp_path / "a.parquet", [(i, i) for i in range(0, 24)])
    write_vecs(tmp_path / "probe.parquet", [(1001, 1)])
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "ann",
        "--mode", "ivfpq", "--state-dir", str(tmp_path / "cstate"),
        "--partitions", "8", "--m-sub", "4", "--k", "3",
        "--refine", "8", "--n-probe", "4",
    ]
    # missing half of the training spec fails fast with a clear message
    r0 = subprocess.run(
        base + ["--ingest", str(tmp_path / "a.parquet"),
                "--train-cells", "4"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r0.returncode != 0 and "--train-codes" in r0.stderr
    r1 = subprocess.run(
        base + ["--ingest", str(tmp_path / "a.parquet"),
                "--train-cells", "4", "--train-codes", "8",
                "--capture-baseline"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    out1 = _json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["indexed_vectors"] == 24 and out1["n_cells"] == 4
    assert out1["m_sub"] == 4 and out1["k_codes"] == 8
    assert out1["baseline_mean_cos"] is not None
    # reopen: sha-guard sees the persisted epoch, drift healthy, and
    # the cell-pruned ADC top-k of an exact copy ranks its source first
    r2 = subprocess.run(
        base + ["--drift", "--query", str(tmp_path / "probe.parquet"),
                "--output", str(tmp_path / "ctopk")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    out2 = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["drift"]["drifted"] is False
    rows = con.execute(
        f"SELECT query_id, rank, id, cosine FROM '{tmp_path}/ctopk/*.parquet'"
    ).fetchall()
    top1 = {q: (i, c) for q, rk, i, c in rows if rk == 1}
    assert top1[1001][0] == 1 and top1[1001][1] > 0.9999
    # rotation retrains cells AND books; the new epoch dir reopens
    # standalone (both halves persisted beside the state) and answers
    r3 = subprocess.run(
        base + ["--rotate-to", str(tmp_path / "cstate2")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r3.returncode == 0, r3.stderr[-2000:]
    out3 = _json.loads(r3.stdout.strip().splitlines()[-1])
    assert out3["new_epoch_vectors"] == 24
    r4 = subprocess.run(
        [
            sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "ann",
            "--mode", "ivfpq", "--state-dir", str(tmp_path / "cstate2"),
            "--partitions", "8", "--m-sub", "4", "--k", "3",
            "--refine", "8", "--n-probe", "4",
            "--query", str(tmp_path / "probe.parquet"),
            "--output", str(tmp_path / "ctopk2"),
        ],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert r4.returncode == 0, r4.stderr[-2000:]
    rows2 = con.execute(
        f"SELECT query_id, rank, id FROM '{tmp_path}/ctopk2/*.parquet'"
    ).fetchall()
    assert {i for q, rk, i in rows2 if rk == 1} == {1}


def test_cli_state_purge_and_rescale(tmp_path, spark):
    """`state --purge-watermark --rescale`: tombstones past the horizon
    drop, the layout re-hashes, and the surviving rows read back
    through a fresh sink opened with the new count."""
    import json as _json

    from sqlserver_pg_cdc_spark.streaming.apply import (
        PartitionedParquetUpsertSink,
    )

    sink = PartitionedParquetUpsertSink(
        spark, str(tmp_path / "st"), ["id"], n_partitions=4
    )
    rows = spark.createDataFrame(
        [(i, f"n{i}", "false", 10 + i) for i in range(30)]
        + [(0, None, "true", 50), (1, None, "true", 90)],
        "id long, name string, __deleted string, lsn long",
    )
    sink(rows, 0)
    cmd = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "state",
        "--state-dir", str(tmp_path / "st"),
        "--pk", "id",
        "--purge-watermark", "60",
        "--rescale", "16",
    ]
    r = subprocess.run(
        cmd, cwd="/root/repo", capture_output=True, text=True, timeout=300
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["purge"]["purged"] == 1  # lsn 50 <= 60; lsn 90 kept
    assert out["n_partitions"] == 16 and out["rescaled"]
    # latest-per-key: ids 0/1 collapse to their tombstones; purge
    # drops id 0 (lsn 50 <= 60) -> 28 live + the id-1 tombstone
    assert out["rows"] == 29
    reopened = PartitionedParquetUpsertSink(
        spark, str(tmp_path / "st"), ["id"], n_partitions=16
    )
    st = reopened.read_target()
    ids = {r2["id"] for r2 in st.collect()}
    assert 0 not in ids and 1 in ids and len(ids) == 29


def test_cli_gate_text_two_batches(tmp_path, spark):
    """`gate --mode text`: batch 0 indexes, batch 1's near-copy of an
    indexed doc rejects as kind='corpus'; the auto batch id counts the
    existing dup-log generations."""
    import json as _json

    docs0 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text about database replication"),
        ],
        "doc_id long, text string",
    )
    docs1 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog today"),
            (11, "another novel document with fresh content entirely"),
        ],
        "doc_id long, text string",
    )
    docs0.write.parquet(str(tmp_path / "b0"))
    docs1.write.parquet(str(tmp_path / "b1"))
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "gate",
        "--mode", "text",
        "--state-dir", str(tmp_path / "gstate"),
        "--dups-dir", str(tmp_path / "gdups"),
        "--threshold", "0.3", "--partitions", "4",
    ]
    r0 = subprocess.run(
        base + ["--ingest", str(tmp_path / "b0")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r0.returncode == 0, r0.stderr[-2000:]
    out0 = _json.loads(r0.stdout.strip().splitlines()[-1])
    assert out0 == {
        "state_dir": str(tmp_path / "gstate"),
        "batch_id": 0,
        "rejected_this_batch": 0,
        "indexed_total": 2,
    }
    r1 = subprocess.run(
        base + ["--ingest", str(tmp_path / "b1")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    out1 = _json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["batch_id"] == 1  # auto: one existing generation
    assert out1["rejected_this_batch"] == 1  # doc 10 duplicates doc 1
    assert out1["indexed_total"] == 3  # doc 11 accepted


def test_cli_gate_compact_dups_and_batch_id_survives(tmp_path, spark):
    """`gate --compact-dups WM` folds closed dup-log generations; the
    next auto batch id must come from the recorded watermark, not the
    (now removed) batch_* dir count — otherwise a compacted id gets
    reused and its log rows are invisible to readers."""
    import json as _json

    dup_text = "the quick brown fox jumps over the lazy dog today"
    docs0 = spark.createDataFrame(
        [(1, dup_text), (2, "unrelated words about database replication")],
        "doc_id long, text string",
    )
    docs1 = spark.createDataFrame(
        [(10, dup_text)], "doc_id long, text string"
    )
    docs2 = spark.createDataFrame(
        [(20, dup_text)], "doc_id long, text string"
    )
    for i, d in enumerate((docs0, docs1, docs2)):
        d.write.parquet(str(tmp_path / f"cb{i}"))
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "gate",
        "--mode", "text",
        "--state-dir", str(tmp_path / "cstate"),
        "--dups-dir", str(tmp_path / "cdups"),
        "--threshold", "0.3", "--partitions", "4",
    ]
    for p in ("cb0", "cb1"):
        r = subprocess.run(
            base + ["--ingest", str(tmp_path / p)],
            cwd="/root/repo", capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
    rc = subprocess.run(
        base + ["--compact-dups", "1"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert rc.returncode == 0, rc.stderr[-2000:]
    outc = _json.loads(rc.stdout.strip().splitlines()[-1])
    assert outc["compacted_batches"] == 2 and outc["watermark_batch_id"] == 1
    # next batch: auto id resumes PAST the watermark and its reject is
    # visible in the compacted-aware log
    r2 = subprocess.run(
        base + ["--ingest", str(tmp_path / "cb2")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    out2 = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["batch_id"] == 2
    assert out2["rejected_this_batch"] == 1  # doc 20 duplicates doc 1


def test_cli_state_scd2_prune(tmp_path, spark):
    """`state --scd2-prune-watermark`: closed versions past the horizon
    drop; time travel above the watermark is unchanged."""
    import json as _json

    from sqlserver_pg_cdc_spark.streaming.scd2 import PartitionedScd2Sink

    sink = PartitionedScd2Sink(
        spark, str(tmp_path / "hist"), ["id"], n_partitions=4
    )
    b = spark.createDataFrame(
        [(1, "v1", 10, "c"), (1, "v2", 20, "u"), (2, "w1", 10, "c")],
        "id long, name string, lsn long, op string",
    )
    sink(b, 0)
    before = {(r["id"], r["name"]) for r in sink.as_of(25).collect()}
    r = subprocess.run(
        [
            sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "state",
            "--state-dir", str(tmp_path / "hist"),
            "--pk", "id",
            "--scd2-prune-watermark", "20",
        ],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["prune"]["pruned"] == 1  # v1 (10->20)
    assert out["rows"] == 2
    reopened = PartitionedScd2Sink(
        spark, str(tmp_path / "hist"), ["id"], n_partitions=4
    )
    assert {(r2["id"], r2["name"]) for r2 in reopened.as_of(25).collect()} == before


def test_cli_gate_embedding_with_cdc_delete(tmp_path, spark):
    """`gate --mode embedding` with --deleted-col: batch 0 indexes,
    batch 1 retires a vector via soft delete (bypasses the probe), and
    a batch-2 copy of the RETIRED vector indexes cleanly."""
    import json as _json

    def vec(i):
        return [float((i * 31 + j * 7) % 13) - 6.0 for j in range(8)]

    spark.createDataFrame(
        [(i, vec(i), 1, "false") for i in range(5)],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    ).write.parquet(str(tmp_path / "b0"))
    spark.createDataFrame(
        [(1, None, 2, "true")],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    ).write.parquet(str(tmp_path / "b1"))
    spark.createDataFrame(
        [(500, vec(1), 3, "false")],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    ).write.parquet(str(tmp_path / "b2"))
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "gate",
        "--mode", "embedding",
        "--state-dir", str(tmp_path / "egstate"),
        "--dups-dir", str(tmp_path / "egdups"),
        "--threshold", "0.99", "--partitions", "4",
        "--lsn-col", "lsn", "--deleted-col", "__deleted",
        "--gate-dim", "8",
    ]
    outs = []
    for b in ("b0", "b1", "b2"):
        r = subprocess.run(
            base + ["--ingest", str(tmp_path / b)],
            cwd="/root/repo", capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(_json.loads(r.stdout.strip().splitlines()[-1]))
    assert outs[0]["rejected_this_batch"] == 0
    assert outs[0]["indexed_total"] == 5
    assert outs[1]["rejected_this_batch"] == 0  # delete bypasses probe
    assert outs[1]["indexed_total"] == 4        # vec 1 retired
    assert outs[2]["rejected_this_batch"] == 0  # twin was retired
    assert outs[2]["indexed_total"] == 5        # 500 indexed


def test_cli_decontam_streaming_gate(tmp_path, spark):
    """`decontam --eval-state-dir`: register benchmarks, retire one via
    CDC delete, then gate a corpus batch against the LIVE eval grams —
    docs overlapping only the RETIRED benchmark pass."""
    import json as _json

    spark.createDataFrame(
        [
            (1, "the secret benchmark question about spark", 1, "false"),
            (2, "another held out evaluation prompt entirely", 1, "false"),
        ],
        "doc_id long, text string, lsn long, __deleted string",
    ).write.parquet(str(tmp_path / "ev0"))
    spark.createDataFrame(
        [(2, None, 2, "true")],
        "doc_id long, text string, lsn long, __deleted string",
    ).write.parquet(str(tmp_path / "ev1"))
    spark.createDataFrame(
        [
            (100, "the secret benchmark question about spark leaked"),
            (101, "another held out evaluation prompt entirely copied"),
            (102, "totally clean training document with fresh words"),
        ],
        "doc_id long, text string",
    ).write.parquet(str(tmp_path / "corpus"))
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "decontam",
        "--eval-state-dir", str(tmp_path / "evstate"),
        "--k", "3", "--partitions", "4",
        "--lsn-col", "lsn", "--deleted-col", "__deleted",
    ]
    for i, ev in enumerate(("ev0", "ev1")):
        r = subprocess.run(
            base + ["--input", str(tmp_path / ev), "--eval-ingest",
                    "--batch-id", str(i)],
            cwd="/root/repo", capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [
            sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "decontam",
            "--eval-state-dir", str(tmp_path / "evstate"),
            "--k", "3", "--partitions", "4",
            "--input", str(tmp_path / "corpus"),
            "--output", str(tmp_path / "acc"),
            "--quarantine-out", str(tmp_path / "quar"),
        ],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out == {"batch_id": 0, "accepted_total": 2, "quarantined_total": 1}
    quar = {r2["doc_id"] for r2 in spark.read.parquet(
        str(tmp_path / "quar" / "batch_0")).collect()}
    assert quar == {100}  # 101 overlaps only the RETIRED benchmark


def test_cli_decontam_semantic_gate_and_compaction(tmp_path, spark):
    """`decontam --semantic`: register eval EMBEDDINGS (one retired via
    CDC delete), gate a corpus vector batch — copies of the live eval
    vector quarantine, copies of the retired one pass; then
    --compact-logs folds the per-batch generations."""
    import json as _json

    def vec(i, dim=8):
        return [float((i * 31 + j * 7) % 13) - 6.0 for j in range(dim)]

    spark.createDataFrame(
        [(1, vec(1), 1, "false"), (2, vec(2), 1, "false")],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    ).write.parquet(str(tmp_path / "sev0"))
    spark.createDataFrame(
        [(2, None, 2, "true")],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    ).write.parquet(str(tmp_path / "sev1"))
    spark.createDataFrame(
        [(100, vec(1)), (101, vec(2)), (102, vec(50))],
        "vec_id long, embedding array<double>",
    ).write.parquet(str(tmp_path / "scorpus"))
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "decontam",
        "--semantic", "--eval-state-dir", str(tmp_path / "sevstate"),
        "--id-col", "vec_id", "--text-col", "embedding", "--dim", "8",
        "--partitions", "4", "--lsn-col", "lsn", "--deleted-col",
        "__deleted", "--threshold", "0.999",
    ]
    for i, ev in enumerate(("sev0", "sev1")):
        r = subprocess.run(
            base + ["--input", str(tmp_path / ev), "--eval-ingest",
                    "--batch-id", str(i)],
            cwd="/root/repo", capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
    gate_cmd = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "decontam",
        "--semantic", "--eval-state-dir", str(tmp_path / "sevstate"),
        "--id-col", "vec_id", "--text-col", "embedding", "--dim", "8",
        "--partitions", "4", "--threshold", "0.999",
        "--input", str(tmp_path / "scorpus"),
        "--output", str(tmp_path / "sacc"),
        "--quarantine-out", str(tmp_path / "squar"),
    ]
    r = subprocess.run(gate_cmd, cwd="/root/repo", capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out == {"batch_id": 0, "accepted_total": 2, "quarantined_total": 1}
    quar = {r2["vec_id"] for r2 in spark.read.parquet(
        str(tmp_path / "squar" / "batch_0")).collect()}
    assert quar == {100}  # 101 matches only the RETIRED eval vector
    # compaction folds the generations; the log reads identically
    rc = subprocess.run(
        [
            sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "decontam",
            "--semantic", "--eval-state-dir", str(tmp_path / "sevstate"),
            "--output", str(tmp_path / "sacc"),
            "--quarantine-out", str(tmp_path / "squar"),
            "--compact-logs", "0",
            "--input", str(tmp_path / "scorpus"),  # unused in compaction
        ],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert rc.returncode == 0, rc.stderr[-2000:]
    outc = _json.loads(rc.stdout.strip().splitlines()[-1])
    assert outc["accepted"]["compacted_batches"] == 1
    assert outc["quarantine"]["compacted_batches"] == 1
    from sqlserver_pg_cdc_spark.streaming.batchlog import read_batch_log

    assert {r2["vec_id"] for r2 in read_batch_log(
        spark, str(tmp_path / "squar")).collect()} == {100}
    # next auto batch id resumes past the watermark
    r2 = subprocess.run(gate_cmd, cwd="/root/repo", capture_output=True,
                        text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    out2 = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["batch_id"] == 1


def test_cli_decontam_retain_batches(tmp_path, spark):
    """`decontam --retain-batches N`: after each corpus gating batch
    the retention policy folds aged-out generations on BOTH logs in the
    same invocation."""
    import glob as _glob
    import json as _json

    spark.createDataFrame(
        [(1, "secret benchmark answer alpha bravo charlie delta echo")],
        "doc_id long, text string",
    ).write.parquet(str(tmp_path / "ev"))
    for b in range(3):
        spark.createDataFrame(
            [(100 + b, "secret benchmark answer alpha bravo charlie delta echo"),
             (200 + b, f"clean document number {b} nothing shared here at all")],
            "doc_id long, text string",
        ).write.parquet(str(tmp_path / f"c{b}"))
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "decontam",
        "--eval-state-dir", str(tmp_path / "evstate"),
        "--k", "5", "--partitions", "4",
    ]
    r = subprocess.run(
        base + ["--input", str(tmp_path / "ev"), "--eval-ingest"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    outs = []
    for b in range(3):
        r = subprocess.run(
            base + ["--input", str(tmp_path / f"c{b}"),
                    "--output", str(tmp_path / "acc"),
                    "--quarantine-out", str(tmp_path / "quar"),
                    "--retain-batches", "1"],
            cwd="/root/repo", capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(_json.loads(r.stdout.strip().splitlines()[-1]))
        for d in ("acc", "quar"):
            ndirs = len(_glob.glob(str(tmp_path / d / "batch_*"))) + len(
                _glob.glob(str(tmp_path / d / "gen_*"))
            )
            assert ndirs <= 1 + 1  # N batch dirs + one generation
    assert [o["batch_id"] for o in outs] == [0, 1, 2]
    assert outs[-1]["retention"]["accepted"]["watermark_batch_id"] == 1
    from sqlserver_pg_cdc_spark.streaming.batchlog import read_batch_log

    quar = {r2["doc_id"] for r2 in read_batch_log(
        spark, str(tmp_path / "quar")).collect()}
    assert quar == {100, 101, 102}  # every leaked copy, across the folds
    acc = {r2["doc_id"] for r2 in read_batch_log(
        spark, str(tmp_path / "acc")).collect()}
    assert acc == {200, 201, 202}


# --- media CLI: the multimodal payload plane ------------------------------

def test_cli_media_audio_and_video_e2e(tmp_path):
    """Drive the media subcommand through a real subprocess: synthesize
    subband-audio and MCV-video payload tables (one corrupt row each),
    run audio frame sampling and video frame sampling, and check the
    decoded geometry — corrupt docs drop, they don't fail the job."""
    import numpy as np
    import pandas as pd

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_mcv,
        encode_subband,
    )

    audio_rows = []
    for doc_id in range(4):
        sig = np.full(2500, 1000 + 500 * doc_id, dtype=np.int16)
        p = encode_subband(1000, sig, kbps=192)
        if doc_id == 2:
            p = p[: len(p) // 2]
        audio_rows.append((doc_id, p))
    video_rows = []
    for doc_id in range(3):
        frames = []
        for f in range(4):
            img = np.full((32, 32, 3), 40 + 10 * doc_id, dtype=np.uint8)
            img[0:16, 16 * (f % 2) : 16 * (f % 2) + 16] = 200
            frames.append(img)
        p = encode_mcv(frames, fps=10, gop=2)
        if doc_id == 1:
            p = b"\x00\x00" + p
        video_rows.append((doc_id, p))

    import pyarrow as pa
    import pyarrow.parquet as pq

    for name, rows in (("audio", audio_rows), ("video", video_rows)):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "payload": pa.array([r[1] for r in rows], pa.binary()),
            }
        )
        pq.write_table(tbl, tmp_path / f"{name}.parquet")

    a_out = tmp_path / "audio_frames"
    r = subprocess.run(
        [sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "media",
         "--input", str(tmp_path / "audio.parquet"), "--mode", "audio",
         "--decoder", "subband", "--output", str(a_out)],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    # 3 surviving docs x 3 one-second frames of the 2.5 s clip
    assert payload["rows"] == 9

    v_out = tmp_path / "video_frames"
    r = subprocess.run(
        [sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "media",
         "--input", str(tmp_path / "video.parquet"), "--mode", "video",
         "--decoder", "mcv", "--stride", "2", "--max-frames", "2",
         "--output", str(v_out)],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    # 2 surviving docs x frames {0, 2}
    assert payload["rows"] == 4


def test_cli_gate_retain_batches_periodic_retention(tmp_path, spark):
    """`gate --retain-batches N` (r9 verdict stretch #8): a long stream
    with the retention flag riding every invocation keeps the dup log
    at <= N batch dirs + one compacted generation, the full log's rows
    survive every fold, and a replay ABOVE the watermark stays
    exactly-once (its generation overwrites, rows never double)."""
    import glob as _glob
    import json as _json

    # every batch re-sends doc 1's text under a fresh id -> exactly one
    # 'corpus' reject per batch after batch 0: a deterministic one-row-
    # per-batch dup log
    base_text = "the quick brown fox jumps over the lazy dog today"
    for b in range(5):
        spark.createDataFrame(
            [(100 + b, base_text),
             (200 + b, f"novel content number {b} with unique words "
                       f"{'x' * (b + 3)} {'y' * (b + 5)}")],
            "doc_id long, text string",
        ).write.parquet(str(tmp_path / f"b{b}"))
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "gate",
        "--mode", "text",
        "--state-dir", str(tmp_path / "gstate"),
        "--dups-dir", str(tmp_path / "gdups"),
        "--threshold", "0.3", "--partitions", "4",
        "--retain-batches", "2",
    ]
    outs = []
    for b in range(5):
        r = subprocess.run(
            base + ["--ingest", str(tmp_path / f"b{b}")],
            cwd="/root/repo", capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(_json.loads(r.stdout.strip().splitlines()[-1]))
        ndirs = len(_glob.glob(str(tmp_path / "gdups" / "batch_*"))) + len(
            _glob.glob(str(tmp_path / "gdups" / "gen_*"))
        )
        assert ndirs <= 2 + 1  # N batch dirs + one compacted generation
    assert [o["batch_id"] for o in outs] == [0, 1, 2, 3, 4]
    assert [o["rejected_this_batch"] for o in outs] == [0, 1, 1, 1, 1]
    assert outs[-1]["retention"]["watermark_batch_id"] == 2
    # full log intact across the folds: one corpus reject per batch 1-4
    from sqlserver_pg_cdc_spark.streaming.batchlog import read_batch_log

    log = read_batch_log(spark, str(tmp_path / "gdups"))
    rows = {(r["doc"], r["__batch_id"]) for r in log.collect()}
    assert rows == {(101, 1), (102, 2), (103, 3), (104, 4)}
    # replay ABOVE the watermark (batch 4): generation overwrites,
    # exactly-once holds, and the retention no-ops (already in window)
    r = subprocess.run(
        base + ["--ingest", str(tmp_path / "b4"), "--batch-id", "4"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["retention"]["compacted_batches"] == 0
    log2 = read_batch_log(spark, str(tmp_path / "gdups"))
    rows2 = {(r["doc"], r["__batch_id"]) for r in log2.collect()}
    assert rows2 == rows


def test_cli_gate_media_audio_cross_container(tmp_path, spark):
    """`gate --mode audio`: batch 0 ingests a WAV recording, batch 1
    ingests its FLAC re-encode under a fresh id — rejected against the
    standing fingerprint index as kind='corpus' at Hamming 0."""
    import json as _json

    import numpy as np
    import pandas as pd

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_flac,
        encode_wav_pcm16,
    )

    t = np.arange(4000)
    x = np.clip(
        6000 * np.sign(np.sin(2 * np.pi * t / 128))
        + 4000 * np.sign(np.sin(2 * np.pi * t / 512)),
        -32767, 32767,
    ).astype(np.int16)
    spark.createDataFrame(
        pd.DataFrame([(1, encode_wav_pcm16(8000, x)),
                      (2, b"not a payload at all")],
                     columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    ).write.parquet(str(tmp_path / "m0"))
    spark.createDataFrame(
        pd.DataFrame([(10, encode_flac(8000, x))],
                     columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    ).write.parquet(str(tmp_path / "m1"))
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "gate",
        "--mode", "audio",
        "--state-dir", str(tmp_path / "mstate"),
        "--dups-dir", str(tmp_path / "mdups"),
        "--partitions", "4",
    ]
    r0 = subprocess.run(
        base + ["--ingest", str(tmp_path / "m0")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r0.returncode == 0, r0.stderr[-2000:]
    out0 = _json.loads(r0.stdout.strip().splitlines()[-1])
    # the corrupt payload passes un-gated with a NULL-fp state row
    assert out0["rejected_this_batch"] == 0 and out0["indexed_total"] == 2
    r1 = subprocess.run(
        base + ["--ingest", str(tmp_path / "m1")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    out1 = _json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["rejected_this_batch"] == 1 and out1["indexed_total"] == 2
    from sqlserver_pg_cdc_spark.streaming.batchlog import read_batch_log

    log = read_batch_log(spark, str(tmp_path / "mdups")).collect()
    assert [(r2["doc"], r2["dup_of"], r2["hamming"], r2["kind"])
            for r2 in log] == [(10, 1, 0, "corpus")]


def test_cli_sample_all_modes(tmp_path, spark):
    """`sample`: the four deterministic samplers through a real
    subprocess — fraction law, weighted law (weight 0 never kept),
    per-stratum cap, and the diversity quota — all reproducible (a
    second run returns the identical set)."""
    import json as _json

    rows = []
    for i in range(400):
        rows.append((i, f"s{i % 4}", 1.0 if i % 2 else 0.0,
                     [float((i % 8) * 31 + j) for j in range(8)]))
    spark.createDataFrame(
        rows, "doc_id long, src string, w double, embedding array<double>"
    ).write.parquet(str(tmp_path / "corpus"))

    def run(mode, *extra):
        cmd = [
            sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "sample",
            "--input", str(tmp_path / "corpus"),
            "--output", str(tmp_path / f"out_{mode}"),
            "--mode", mode, "--key-col", "doc_id", *extra,
        ]
        r = subprocess.run(cmd, cwd="/root/repo", capture_output=True,
                           text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        return _json.loads(r.stdout.strip().splitlines()[-1])

    det = run("deterministic", "--fraction", "0.25")
    assert det["rows_in"] == 400
    assert 0.15 * 400 < det["rows_out"] < 0.35 * 400
    det2 = run("deterministic", "--fraction", "0.25")
    assert det2["rows_out"] == det["rows_out"]  # pure function of data

    wtd = run("weighted", "--fraction", "0.5", "--weight-col", "w")
    kept = {r2[0] for r2 in spark.read.parquet(
        str(tmp_path / "out_weighted")).select("doc_id").collect()}
    assert kept and all(k % 2 == 1 for k in kept)  # weight-0 never kept

    strat = run("stratified", "--strata", "src", "--per-stratum", "10")
    assert strat["rows_out"] == 40  # 4 strata x 10
    per = spark.read.parquet(str(tmp_path / "out_stratified")) \
        .groupBy("src").count().collect()
    assert all(r2["count"] == 10 for r2 in per)

    div = run("diversity", "--vec-col", "embedding",
              "--quota", "5", "--cells", "8")
    out = spark.read.parquet(str(tmp_path / "out_diversity"))
    per_cell = out.groupBy("cell_id").count().collect()
    assert all(r2["count"] <= 5 for r2 in per_cell)
    assert div["rows_out"] == sum(r2["count"] for r2 in per_cell)


def test_cli_media_fingerprint_modes(tmp_path, spark):
    """`media --mode afp` with --near-pairs: cross-container audio
    fingerprints through a real subprocess — a WAV and its FLAC
    re-encode share one fingerprint (a Hamming-0 near pair), a corrupt
    payload fingerprints NULL."""
    import json as _json

    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_flac,
        encode_wav_pcm16,
    )

    t = np.arange(4000)
    x = np.clip(
        6000 * np.sign(np.sin(2 * np.pi * t / 128))
        + 4000 * np.sign(np.sin(2 * np.pi * t / 512)),
        -32767, 32767,
    ).astype(np.int16)
    y = np.clip(
        5000 * np.sign(np.sin(2 * np.pi * t / 64)), -32767, 32767
    ).astype(np.int16)
    spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm16(8000, x))),
            (2, bytearray(encode_flac(8000, x))),   # re-encode of 1
            (3, bytearray(encode_flac(8000, y))),   # distinct recording
            (4, bytearray(b"\x00not audio")),       # corrupt
        ],
        "doc_id long, payload binary",
    ).write.parquet(str(tmp_path / "audio"))
    r = subprocess.run(
        [
            sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "media",
            "--mode", "afp", "--input", str(tmp_path / "audio"),
            "--output", str(tmp_path / "fps"),
            "--near-pairs", str(tmp_path / "pairs"),
        ],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["rows"] == 4 and out["fingerprinted"] == 3
    fps = {r2["doc_id"]: r2["afp"] for r2 in spark.read.parquet(
        str(tmp_path / "fps")).collect()}
    assert fps[1] == fps[2] and fps[1] != fps[3] and fps[4] is None
    pairs = {(r2["a"], r2["b"], r2["hamming"]) for r2 in spark.read.parquet(
        str(tmp_path / "pairs")).collect()}
    assert (1, 2, 0) in pairs
    assert all(a != 4 and b != 4 for a, b, _ in pairs)


def _mixed_media_rows():
    """One image + one audio + one video payload, plus a re-encode of
    each in ANOTHER container — the mixed-crawl-topic shape."""
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_bmp,
        encode_flac,
        encode_jpeg,
        encode_mcv,
        encode_png,
        encode_wav_pcm16,
    )

    y, x = np.mgrid[0:64, 0:64]
    g = ((37 * (x // 16) + 59 * (y // 16)) % 256).astype(np.uint8)
    img = np.stack([g] * 3, axis=2)
    t = np.arange(4000)
    snd = np.clip(
        6000 * np.sign(np.sin(2 * np.pi * t / 128)), -32767, 32767
    ).astype(np.int16)
    yy, xx = np.mgrid[0:32, 0:48]
    base = (((yy // 8) * 74 + (xx // 8) * 159) % 200 + 20).astype(np.uint8)
    frames = []
    for f in range(8):
        px = np.stack([base, np.full_like(base, 40), base[::-1]], axis=2)
        px[8 * (f % 3):8 * (f % 3) + 8, 8 * f % 32:8 * f % 32 + 16] = 235
        frames.append(px.astype(np.uint8))
    jpegs = [encode_jpeg(48, 32, fr.tobytes()) for fr in frames]
    return {
        "image": (encode_png(64, 64, img.tobytes()),
                  encode_bmp(64, 64, img.tobytes())),
        "audio": (encode_wav_pcm16(8000, snd), encode_flac(8000, snd)),
        "video": (encode_mcv(frames, fps=10, gop=4, qscale=4),
                  encode_avi_mjpeg(jpegs, 48, 32, fps=10)),
    }


def test_cli_gate_media_auto_mixed_stream(tmp_path, spark):
    """`gate --mode auto` (round-10 verdict item #3): one sink gates a
    MIXED image+audio+video topic — batch 0 indexes one doc per family,
    batch 1's re-encodes (different container per family) are each
    rejected against their OWN family's canonical."""
    import json as _json

    import pandas as pd

    media = _mixed_media_rows()
    spark.createDataFrame(
        pd.DataFrame(
            [(1, media["image"][0]), (2, media["audio"][0]),
             (3, media["video"][0])],
            columns=["doc_id", "payload"],
        ),
        "doc_id long, payload binary",
    ).write.parquet(str(tmp_path / "b0"))
    spark.createDataFrame(
        pd.DataFrame(
            [(11, media["image"][1]), (12, media["audio"][1]),
             (13, media["video"][1])],
            columns=["doc_id", "payload"],
        ),
        "doc_id long, payload binary",
    ).write.parquet(str(tmp_path / "b1"))
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "gate",
        "--mode", "auto",
        "--state-dir", str(tmp_path / "astate"),
        "--dups-dir", str(tmp_path / "adups"),
        "--partitions", "4",
    ]
    r0 = subprocess.run(
        base + ["--ingest", str(tmp_path / "b0")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r0.returncode == 0, r0.stderr[-2000:]
    out0 = _json.loads(r0.stdout.strip().splitlines()[-1])
    assert out0["rejected_this_batch"] == 0 and out0["indexed_total"] == 3
    r1 = subprocess.run(
        base + ["--ingest", str(tmp_path / "b1")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    out1 = _json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["rejected_this_batch"] == 3 and out1["indexed_total"] == 3
    from sqlserver_pg_cdc_spark.streaming.batchlog import read_batch_log

    log = {r2["doc"]: r2["dup_of"] for r2 in read_batch_log(
        spark, str(tmp_path / "adups")).collect()}
    assert log == {11: 1, 12: 2, 13: 3}


def test_cli_media_mfp_and_vhash(tmp_path, spark):
    """`media --mode mfp` (mixed fingerprinting, family-scoped near
    pairs) and `--mode vhash` (video fingerprints) through a real
    subprocess."""
    import json as _json

    media = _mixed_media_rows()
    rows = [
        (1, bytearray(media["image"][0])), (2, bytearray(media["image"][1])),
        (3, bytearray(media["audio"][0])), (4, bytearray(media["audio"][1])),
        (5, bytearray(media["video"][0])), (6, bytearray(media["video"][1])),
        (7, bytearray(b"\x00not media")),
    ]
    spark.createDataFrame(
        rows, "doc_id long, payload binary"
    ).write.parquet(str(tmp_path / "mixed"))
    r = subprocess.run(
        [
            sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "media",
            "--mode", "mfp", "--input", str(tmp_path / "mixed"),
            "--output", str(tmp_path / "fps"),
            "--near-pairs", str(tmp_path / "pairs"),
        ],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["rows"] == 7 and out["fingerprinted"] == 6
    fam = {r2["doc_id"]: r2["family"] for r2 in spark.read.parquet(
        str(tmp_path / "fps")).collect()}
    assert fam == {1: "image", 2: "image", 3: "audio", 4: "audio",
                   5: "video", 6: "video", 7: None}
    pairs = {(r2["a"], r2["b"]): r2["family"] for r2 in spark.read.parquet(
        str(tmp_path / "pairs")).collect()}
    assert pairs == {(1, 2): "image", (3, 4): "audio", (5, 6): "video"}
    # vhash over just the video rows
    spark.createDataFrame(
        rows[4:6], "doc_id long, payload binary"
    ).write.parquet(str(tmp_path / "vids"))
    rv = subprocess.run(
        [
            sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "media",
            "--mode", "vhash", "--input", str(tmp_path / "vids"),
            "--output", str(tmp_path / "vfps"),
            "--near-pairs", str(tmp_path / "vpairs"),
        ],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert rv.returncode == 0, rv.stderr[-2000:]
    outv = _json.loads(rv.stdout.strip().splitlines()[-1])
    assert outv["rows"] == 2 and outv["fingerprinted"] == 2
    vp = [(r2["a"], r2["b"], r2["hamming"]) for r2 in spark.read.parquet(
        str(tmp_path / "vpairs")).collect()]
    assert len(vp) == 1 and vp[0][:2] == (5, 6) and vp[0][2] <= 6


def test_cli_sample_diversity_stream(tmp_path, spark):
    """`sample --mode diversity-stream`: each invocation folds one
    batch into the standing selection state; after two batches the
    output equals the batch diversity sampler over the union (the
    streamed-selection invariant through a real subprocess)."""
    import json as _json

    def vecs(ids):
        rows = []
        for i in ids:
            c = i % 8
            base = [1.0 if d == c % 6 else 0.1 * ((c + d) % 3)
                    for d in range(6)]
            rows.append((i, [b + 0.01 * ((i * (d + 3)) % 7)
                             for d, b in enumerate(base)]))
        return spark.createDataFrame(rows, "doc_id long, v array<double>")

    b0, b1 = list(range(0, 60)), list(range(60, 150))
    vecs(b0).write.parquet(str(tmp_path / "b0"))
    vecs(b1).write.parquet(str(tmp_path / "b1"))
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "sample",
        "--mode", "diversity-stream", "--key-col", "doc_id",
        "--vec-col", "v", "--quota", "3", "--cells", "4",
        "--state-dir", str(tmp_path / "divstate"), "--partitions", "4",
    ]
    for i, b in enumerate(("b0", "b1")):
        r = subprocess.run(
            base + ["--input", str(tmp_path / b),
                    "--output", str(tmp_path / f"sel{i}")],
            cwd="/root/repo", capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        out = _json.loads(r.stdout.strip().splitlines()[-1])
        assert out["rows_out"] <= 3 * 4
    got = {(r2["doc"], r2["cell_id"]) for r2 in spark.read.parquet(
        str(tmp_path / "sel1")).collect()}
    # batch sampler over the union with the sink's persisted epoch
    from sqlserver_pg_cdc_spark.functions.vectors import norm
    from sqlserver_pg_cdc_spark.operators.sampling import diversity_sample
    from pyspark.sql import functions as F

    cents = spark.read.parquet(str(tmp_path / "divstate" / "__centroids"))
    cents = cents.select("cell_id", "cv", norm("cv").alias("cn"))
    want = {
        (r2["doc_id"], r2["cell_id"])
        for r2 in diversity_sample(
            vecs(b0 + b1), "doc_id", "v", 3, n_cells=4, centroids=cents
        ).collect()
    }
    assert got == want


def test_cli_sample_diversity_stream_rotate(tmp_path, spark):
    """`sample --mode diversity-stream` staleness discipline (round-11
    verdict #3): --capture-baseline after bootstrap, --drift fires
    under a shifted stream, --rotate-to opens a new epoch whose
    selection is the EXACT batch sampler over the supplied corpus with
    the retrained cells; the rotated state keeps folding."""
    import json as _json

    def vecs(spark_, rows):
        return spark_.createDataFrame(rows, "doc_id long, v array<double>")

    boot = [(2 * i, [1.0, 0.01 * i, 0.0]) for i in range(8)]
    boot += [(2 * i + 1, [0.0, 1.0, 0.01 * i]) for i in range(8)]
    shifted = [(200 + i, [0.0, 0.0, 1.0 + 0.001 * i]) for i in range(40)]
    vecs(spark, boot).write.parquet(str(tmp_path / "boot"))
    vecs(spark, shifted).write.parquet(str(tmp_path / "shift"))
    vecs(spark, boot + shifted).write.parquet(str(tmp_path / "union"))
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "sample",
        "--mode", "diversity-stream", "--key-col", "doc_id",
        "--vec-col", "v", "--quota", "4", "--cells", "2",
        "--state-dir", str(tmp_path / "divstate"), "--partitions", "4",
    ]

    def run(*flags, inp="boot", outp="sel"):
        r = subprocess.run(
            base + ["--input", str(tmp_path / inp),
                    "--output", str(tmp_path / outp)] + list(flags),
            cwd="/root/repo", capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return _json.loads(r.stdout.strip().splitlines()[-1])

    run()  # bootstrap fold
    out = run("--capture-baseline")
    assert out["baseline_mean_cos"] > 0.9
    out = run("--drift", "0.05")
    assert not out["drift"]["drifted"]
    run(inp="shift", outp="sel2")  # the distribution leaves the epoch
    out = run("--drift", "0.05")
    assert out["drift"]["drifted"]
    out = run(
        "--rotate-to", str(tmp_path / "div2"), "--rotate-cells", "3",
        inp="union", outp="sel3",
    )
    assert out["rotated_to"] == str(tmp_path / "div2")
    # exactness: the rotated selection IS the batch sampler over the
    # union with the new epoch's persisted centroids
    from sqlserver_pg_cdc_spark.functions.vectors import norm
    from sqlserver_pg_cdc_spark.operators.sampling import diversity_sample

    cents = spark.read.parquet(str(tmp_path / "div2" / "__centroids"))
    cents = cents.select("cell_id", "cv", norm("cv").alias("cn"))
    want = {
        (r2["doc_id"], r2["cell_id"])
        for r2 in diversity_sample(
            vecs(spark, boot + shifted), "doc_id", "v", 4, n_cells=3,
            centroids=cents,
        ).collect()
    }
    got = {(r2["doc"], r2["cell_id"]) for r2 in spark.read.parquet(
        str(tmp_path / "sel3")).collect()}
    assert got == want
    # the rotated epoch carries its own baseline and keeps folding
    assert os.path.exists(
        str(tmp_path / "div2" / "__diversity_baseline.json")
    )
    more = [(900 + i, [0.5, 0.5, 0.5 + 0.001 * i]) for i in range(6)]
    vecs(spark, more).write.parquet(str(tmp_path / "more"))
    out = subprocess.run(
        [a if a != str(tmp_path / "divstate") else str(tmp_path / "div2")
         for a in base]
        + ["--input", str(tmp_path / "more"),
           "--output", str(tmp_path / "sel4"), "--cells", "3"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]


def test_cli_gate_video_frame_granularity_recut(tmp_path, spark):
    """`gate --mode video --granularity frame`: a RE-CUT (4 of the
    indexed clip's 8 scenes, other container) arriving in batch 1 is
    rejected under the >= k matching-frames law through a real
    subprocess."""
    import json as _json

    import pandas as pd

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg,
        encode_mcv,
    )
    from sqlserver_pg_cdc_spark.workload import _RECUT_FRAMES, _recut_scene

    orig = encode_mcv(
        [_recut_scene(0, f) for f in range(8)], fps=10, gop=4, qscale=4
    )
    recut = encode_avi_mjpeg(
        [encode_jpeg(48, 32, _recut_scene(0, f).tobytes())
         for f in _RECUT_FRAMES],
        48, 32, fps=10,
    )
    other = encode_mcv(
        [_recut_scene(4, f) for f in range(8)], fps=10, gop=4, qscale=4
    )
    spark.createDataFrame(
        pd.DataFrame([(1, orig)], columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    ).write.parquet(str(tmp_path / "v0"))
    spark.createDataFrame(
        pd.DataFrame([(2, recut), (3, other)],
                     columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    ).write.parquet(str(tmp_path / "v1"))
    base = [
        sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "gate",
        "--mode", "video", "--granularity", "frame",
        "--min-match-frames", "3",
        "--state-dir", str(tmp_path / "vstate"),
        "--dups-dir", str(tmp_path / "vdups"),
        "--partitions", "4",
    ]
    r0 = subprocess.run(
        base + ["--ingest", str(tmp_path / "v0")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r0.returncode == 0, r0.stderr[-2000:]
    r1 = subprocess.run(
        base + ["--ingest", str(tmp_path / "v1")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    out1 = _json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["rejected_this_batch"] == 1 and out1["indexed_total"] == 2
    from sqlserver_pg_cdc_spark.streaming.batchlog import read_batch_log

    log = {r["doc"]: r for r in read_batch_log(
        spark, str(tmp_path / "vdups")).collect()}
    assert set(log) == {2}
    assert log[2]["dup_of"] == 1 and log[2]["hamming"] == 0
    # a clip-granularity open of the same state fails fast
    rbad = subprocess.run(
        [a for a in base if a not in
         ("--granularity", "frame", "--min-match-frames", "3")]
        + ["--ingest", str(tmp_path / "v0")],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert rbad.returncode != 0
    assert "different parameters" in rbad.stderr


def test_cli_media_vframe_near_clip_pairs(tmp_path, spark):
    """`media --mode vframe --near-pairs`: per-frame fingerprints +
    the >= k matching-frames clip pairs from the batch CLI — a re-cut
    pairs with its source, a distinct clip does not."""
    import json as _json

    import pandas as pd

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg,
        encode_mcv,
    )
    from sqlserver_pg_cdc_spark.workload import _RECUT_FRAMES, _recut_scene

    rows = [
        (1, encode_mcv([_recut_scene(0, f) for f in range(8)],
                       fps=10, gop=4, qscale=4)),
        (2, encode_avi_mjpeg(
            [encode_jpeg(48, 32, _recut_scene(0, f).tobytes())
             for f in _RECUT_FRAMES], 48, 32, fps=10)),
        (3, encode_mcv([_recut_scene(5, f) for f in range(8)],
                       fps=10, gop=4, qscale=4)),
        (4, b"\x00not-a-video"),
    ]
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    ).write.parquet(str(tmp_path / "clips"))
    r = subprocess.run(
        [sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "media",
         "--mode", "vframe", "--input", str(tmp_path / "clips"),
         "--output", str(tmp_path / "fps"),
         "--near-pairs", str(tmp_path / "pairs"),
         "--min-match-frames", "3", "--partitions", "4"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["rows"] == 4 and out["fingerprinted"] == 3
    assert out["near_pairs"] == 1
    p = spark.read.parquet(str(tmp_path / "pairs")).collect()
    assert [(r2["a"], r2["b"], r2["n_frames"], r2["hamming"])
            for r2 in p] == [(1, 2, 4, 0)]
