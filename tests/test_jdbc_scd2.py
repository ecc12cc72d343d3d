"""Executed SCD2 sink against a live DuckDB target (round-7 verdict #8):
the versioned-history twin of test_jdbc_upsert.py — close-current +
insert-new in ONE transaction per batch, replay idempotence by
(key, LSN), out-of-order LSN convergence via the set-based chain
recompute, and parity with the parquet `scd2_apply` contract."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.sources.jdbc import DbApiScd2Sink
from sqlserver_pg_cdc_spark.streaming.scd2 import OPEN_LSN, scd2_apply

COLS = "id long, name string, amount double, lsn long, op string"
HIST_DDL = (
    "CREATE TABLE hist (id BIGINT, name VARCHAR, amount DOUBLE,"
    " __lsn BIGINT, __is_delete BOOLEAN, __valid_from_lsn BIGINT,"
    " __valid_to_lsn BIGINT, __active BOOLEAN)"
)


def _mk_target(path):
    con = duckdb.connect(path)
    con.execute(HIST_DDL)
    con.close()


def _mk_sink(path):
    return DbApiScd2Sink(lambda: duckdb.connect(path), "hist", ["id"])


def _db_hist(path):
    con = duckdb.connect(path)
    rows = con.execute(
        "SELECT id, name, amount, __lsn, __is_delete, __valid_from_lsn,"
        " __valid_to_lsn, __active FROM hist ORDER BY id, __lsn"
    ).fetchall()
    con.close()
    return [tuple(r) for r in rows]


def _spark_hist(frame):
    return sorted(
        (
            (
                r["id"], r["name"], r["amount"], r["__lsn"], r["__is_delete"],
                r["__valid_from_lsn"], r["__valid_to_lsn"], r["__active"],
            )
            for r in frame.collect()
        ),
        key=lambda t: (t[0], t[3]),
    )


def test_versions_close_and_deletes_tombstone(spark, tmp_path):
    db = str(tmp_path / "t.db")
    _mk_target(db)
    sink = _mk_sink(db)
    b0 = spark.createDataFrame(
        [(1, "a", 10.0, 1, "c"), (2, "b", 20.0, 2, "c")], COLS
    )
    b1 = spark.createDataFrame(
        [(1, "a2", 11.0, 5, "u"), (2, None, None, 6, "d")], COLS
    )
    sink(b0, 0)
    sink(b1, 1)
    # parity with the parquet scd2_apply contract on the same batches
    want = scd2_apply(None, b0, ["id"])
    want = scd2_apply(want, b1, ["id"])
    assert _db_hist(db) == _spark_hist(want)
    # and spot-check the semantics directly
    rows = {(r[0], r[3]): r for r in _db_hist(db)}
    assert rows[(1, 1)][6] == 5 and rows[(1, 1)][7] is False   # closed at 5
    assert rows[(1, 5)][6] == OPEN_LSN and rows[(1, 5)][7] is True
    assert rows[(2, 6)][4] is True and rows[(2, 6)][7] is False  # tombstone


def test_replay_idempotent_and_within_batch_dupes(spark, tmp_path):
    db = str(tmp_path / "t.db")
    _mk_target(db)
    sink = _mk_sink(db)
    b0 = spark.createDataFrame(
        [(1, "a", 10.0, 1, "c"), (1, "a", 10.0, 1, "c"),  # transport dupe
         (1, "a2", 11.0, 3, "u")], COLS
    )
    sink(b0, 0)
    first = _db_hist(db)
    assert len(first) == 2  # dupe collapsed, both versions kept
    sink(b0, 0)  # full replay: no-op
    assert _db_hist(db) == first


def test_out_of_order_lsn_converges(spark, tmp_path):
    """A late-arriving MIDDLE version must splice into the chain: the
    set-based recompute rebuilds affected chains from the stored set."""
    db = str(tmp_path / "t.db")
    _mk_target(db)
    sink = _mk_sink(db)
    sink(spark.createDataFrame([(1, "v1", 1.0, 10, "c")], COLS), 0)
    sink(spark.createDataFrame([(1, "v3", 3.0, 30, "u")], COLS), 1)
    sink(spark.createDataFrame([(1, "v2", 2.0, 20, "u")], COLS), 2)  # late
    got = _db_hist(db)
    by_lsn = {r[3]: r for r in got}
    assert by_lsn[10][6] == 20 and by_lsn[10][7] is False
    assert by_lsn[20][6] == 30 and by_lsn[20][7] is False
    assert by_lsn[30][6] == OPEN_LSN and by_lsn[30][7] is True
    # equals the parquet apply over the same three batches
    want = scd2_apply(None, spark.createDataFrame([(1, "v1", 1.0, 10, "c")], COLS), ["id"])
    want = scd2_apply(want, spark.createDataFrame([(1, "v3", 3.0, 30, "u")], COLS), ["id"])
    want = scd2_apply(want, spark.createDataFrame([(1, "v2", 2.0, 20, "u")], COLS), ["id"])
    assert got == _spark_hist(want)


def test_batching_crosses_chunk_boundary_and_untouched_keys_intact(spark, tmp_path):
    db = str(tmp_path / "t.db")
    _mk_target(db)
    sink = DbApiScd2Sink(
        lambda: duckdb.connect(db), "hist", ["id"], batch_size=7
    )
    b0 = spark.createDataFrame(
        [(i, f"n{i}", float(i), i + 100, "c") for i in range(40)], COLS
    )
    sink(b0, 0)
    # second batch touches only 3 keys; other chains must be untouched
    b1 = spark.createDataFrame(
        [(i, f"u{i}", float(i) * 2, i + 500, "u") for i in (3, 7, 11)], COLS
    )
    sink(b1, 1)
    got = _db_hist(db)
    assert len(got) == 43
    want = scd2_apply(scd2_apply(None, b0, ["id"]), b1, ["id"])
    assert got == _spark_hist(want)


def test_streaming_pipeline_into_live_scd2(spark, tmp_path):
    """End-to-end: writeStream foreachBatch into the live-DB SCD2 sink,
    split so a key's versions span batch boundaries."""
    import json
    import os

    db = str(tmp_path / "t.db")
    _mk_target(db)
    sink = _mk_sink(db)
    spool = tmp_path / "spool"
    os.makedirs(spool)
    events = [
        {"id": 1, "name": "a", "amount": 1.0, "lsn": 1, "op": "c"},
        {"id": 2, "name": "b", "amount": 2.0, "lsn": 2, "op": "c"},
        {"id": 1, "name": "a2", "amount": 1.5, "lsn": 3, "op": "u"},
        {"id": 2, "name": None, "amount": None, "lsn": 4, "op": "d"},
    ]
    for i, ev in enumerate(events):
        with open(spool / f"{i}.json", "w") as f:
            f.write(json.dumps(ev) + "\n")
    q = (
        spark.readStream.schema(COLS)
        .option("maxFilesPerTrigger", 2)
        .json(str(spool))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _db_hist(db)
    assert len(got) == 4
    active = [r for r in got if r[7]]
    assert len(active) == 1 and active[0][0] == 1 and active[0][1] == "a2"


def test_identifier_validation():
    with pytest.raises(ValueError):
        DbApiScd2Sink(lambda: None, "hist; DROP TABLE x", ["id"])
    with pytest.raises(ValueError):
        DbApiScd2Sink(lambda: None, "hist", ["bad-col"])
