"""Executed upsert-sink tests against a live DuckDB target: the same
INSERT .. ON CONFLICT statement shape the reference's PostgreSQL sink
runs (postgresql-sink.json:23-34, FR-005), with the LSN idempotence
guard pushed into the SQL. Proves at-least-once replay and out-of-order
delivery converge at the database, not just in the DataFrame merge."""

import json

import duckdb
import pytest

from sqlserver_pg_cdc_spark.sources.jdbc import (
    DbApiUpsertSink,
    on_conflict_upsert_sql,
)

COLS = "id long, name string, amount double, lsn long, __deleted string"


def _mk_target(path):
    con = duckdb.connect(path)
    con.execute(
        "CREATE TABLE target (id BIGINT PRIMARY KEY, name VARCHAR,"
        " amount DOUBLE, lsn BIGINT, __deleted VARCHAR)"
    )
    con.close()


def _db_state(path):
    con = duckdb.connect(path)
    rows = con.execute(
        "SELECT id, name, amount, lsn, __deleted FROM target ORDER BY id"
    ).fetchall()
    con.close()
    return {r[0]: r[1:] for r in rows}


def _mk_sink(path):
    # factory must be shippable to executors; cloudpickle handles the
    # closure over the path string
    return DbApiUpsertSink(
        lambda: duckdb.connect(path),
        "target",
        ["id"],
        placeholder="?",
        parallel=False,  # DuckDB file = single writer
    )


def test_upsert_sql_shape_and_guard():
    sql = on_conflict_upsert_sql(
        "t", ["id", "name", "lsn"], ["id"], placeholder="?", lsn_guard_col="lsn"
    )
    assert "INSERT INTO t (id, name, lsn) VALUES (?, ?, ?)" in sql
    assert "ON CONFLICT (id) DO UPDATE SET name = EXCLUDED.name" in sql
    assert sql.endswith("WHERE t.lsn <= EXCLUDED.lsn")
    with pytest.raises(ValueError):
        on_conflict_upsert_sql("t; DROP TABLE x", ["id"], ["id"])
    with pytest.raises(ValueError):
        on_conflict_upsert_sql("t", ["id", "bad-col"], ["id"])


def test_insert_update_and_replay_idempotency(spark, tmp_path):
    path = str(tmp_path / "t.duckdb")
    _mk_target(path)
    sink = _mk_sink(path)

    b0 = spark.createDataFrame(
        [
            (1, "alice", 10.0, 1, "false"),
            (2, "bob", 20.0, 2, "false"),
            # within-batch dedup: two changes for id=3, higher LSN wins
            (3, "carol_v1", 1.0, 3, "false"),
            (3, "carol_v2", 2.0, 4, "false"),
        ],
        COLS,
    )
    sink(b0, 0)
    st = _db_state(path)
    assert st == {
        1: ("alice", 10.0, 1, "false"),
        2: ("bob", 20.0, 2, "false"),
        3: ("carol_v2", 2.0, 4, "false"),
    }

    # at-least-once: replay the identical batch -> no change
    sink(b0, 1)
    assert _db_state(path) == st

    # update + soft delete in a later batch
    b1 = spark.createDataFrame(
        [(1, "alice2", 11.0, 5, "false"), (2, "bob", 20.0, 6, "true")], COLS
    )
    sink(b1, 2)
    st2 = _db_state(path)
    assert st2[1] == ("alice2", 11.0, 5, "false")
    assert st2[2] == ("bob", 20.0, 6, "true")  # soft-deleted row survives

    # out-of-order straggler with a stale LSN must be guarded out
    b2 = spark.createDataFrame([(1, "ancient", 0.0, 2, "false")], COLS)
    sink(b2, 3)
    assert _db_state(path) == st2


def test_batching_crosses_chunk_boundary(spark, tmp_path):
    """More rows than batch_size exercises the chunked executemany."""
    path = str(tmp_path / "t.duckdb")
    _mk_target(path)
    sink = _mk_sink(path)
    sink.batch_size = 7
    n = 100
    rows = [(i, f"n{i}", float(i), i, "false") for i in range(n)]
    sink(spark.createDataFrame(rows, COLS), 0)
    st = _db_state(path)
    assert len(st) == n
    assert st[99] == ("n99", 99.0, 99, "false")


def test_streaming_pipeline_into_live_db(spark, tmp_path):
    """Full streaming path: JSON change spool -> Structured Streaming
    (availableNow) -> unwrap/soft-delete chain -> DbApiUpsertSink
    executing ON CONFLICT upserts in a live DuckDB target — the executed
    twin of the reference's Debezium -> Kafka Connect -> JDBC sink."""
    import duckdb as _duckdb

    from pyspark.sql import types as T

    from sqlserver_pg_cdc_spark.streaming.pipeline import CdcPipeline
    from tests.test_streaming import PAYLOAD, _event, _spool

    path = str(tmp_path / "live.duckdb")
    con = _duckdb.connect(path)
    con.execute(
        "CREATE TABLE target (id BIGINT PRIMARY KEY, name VARCHAR, amount DOUBLE,"
        " __op VARCHAR, ts_ms BIGINT, lsn BIGINT, __deleted VARCHAR, __stale BOOLEAN)"
    )
    con.close()

    sink = DbApiUpsertSink(
        lambda: _duckdb.connect(path), "target", ["id"],
        placeholder="?", parallel=False,
    )
    p = CdcPipeline(
        spark,
        source_dir=str(tmp_path / "spool"),
        target_dir=str(tmp_path / "unused"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        payload_schema=PAYLOAD,
        pk_cols=["id"],
        sink=sink,
    )
    _spool(p.source_dir, [
        _event(1, "c", {"id": 1, "name": "alice", "amount": 10.0}),
        _event(2, "c", {"id": 2, "name": "bob", "amount": 20.0}),
        _event(3, "u", {"id": 1, "name": "alice2", "amount": 11.0}),
        _event(4, "d", {"id": 2, "name": "bob", "amount": 20.0}),
    ])
    p.run_available_now()

    con = _duckdb.connect(path)
    state = {
        r[0]: r[1:] for r in con.execute(
            "SELECT id, name, amount, __deleted FROM target ORDER BY id"
        ).fetchall()
    }
    con.close()
    assert state == {1: ("alice2", 11.0, "false"), 2: ("bob", 20.0, "true")}

    # restart from the same checkpoint: nothing re-applies (exactly-once
    # effect via checkpoint + in-SQL LSN guard)
    p.run_available_now()
    con = _duckdb.connect(path)
    assert con.execute("SELECT count(*) FROM target").fetchone()[0] == 2
    con.close()
