"""SCD2 history apply: versioned CDC semantics — every intermediate
version preserved, deletes close the chain, replay idempotent, time
travel reconstructs any LSN, and the active view equals the upsert
sink's latest-per-key result."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.streaming.scd2 import (
    OPEN_LSN,
    as_of_lsn,
    current_view,
    scd2_apply,
)

SCHEMA = "id long, name string, lsn long, op string"


@pytest.fixture(scope="module")
def history(spark):
    b1 = spark.createDataFrame(
        [(1, "alice", 10, "c"), (2, "bob", 11, "c"), (1, "alicia", 20, "u")],
        SCHEMA,
    )
    h1 = scd2_apply(None, b1, ["id"])
    b2 = spark.createDataFrame(
        [(2, None, 30, "d"), (3, "carol", 31, "c"), (1, "alyce", 40, "u")],
        SCHEMA,
    )
    return scd2_apply(h1, b2, ["id"])


def test_all_versions_preserved_with_intervals(spark, history):
    rows = {(r["id"], r["__lsn"]): r for r in history.collect()}
    assert len(rows) == 6  # 3 for id 1, 2 for id 2 (incl tombstone), 1 for id 3
    assert rows[(1, 10)]["__valid_to_lsn"] == 20
    assert rows[(1, 20)]["__valid_to_lsn"] == 40
    assert rows[(1, 40)]["__valid_to_lsn"] == OPEN_LSN
    assert rows[(2, 11)]["__valid_to_lsn"] == 30  # closed by the delete
    assert rows[(2, 30)]["__is_delete"] and not rows[(2, 30)]["__active"]


def test_current_view_matches_upsert_semantics(spark, history):
    cur = {(r["id"], r["name"]) for r in current_view(history).collect()}
    assert cur == {(1, "alyce"), (3, "carol")}  # id 2 deleted


def test_time_travel(spark, history):
    at_25 = {(r["id"], r["name"]) for r in as_of_lsn(history, 25).collect()}
    assert at_25 == {(1, "alicia"), (2, "bob")}
    at_10 = {(r["id"], r["name"]) for r in as_of_lsn(history, 10).collect()}
    assert at_10 == {(1, "alice")}


def test_replay_is_idempotent(spark, history):
    replay = spark.createDataFrame(
        [(1, "alyce", 40, "u"), (3, "carol", 31, "c")], SCHEMA
    )
    again = scd2_apply(history, replay, ["id"])
    assert again.count() == history.count()
    cur = {(r["id"], r["name"]) for r in current_view(again).collect()}
    assert cur == {(1, "alyce"), (3, "carol")}


def test_untouched_keys_not_rewritten(spark, history):
    """A batch touching only id 3 must leave id 1/2 version rows
    byte-identical (the semi/anti split keeps the rewrite O(changed
    keys))."""
    b = spark.createDataFrame([(3, "carola", 50, "u")], SCHEMA)
    h2 = scd2_apply(history, b, ["id"])
    before = {tuple(r) for r in history.filter("id != 3").collect()}
    after = {tuple(r) for r in h2.filter("id != 3").collect()}
    assert before == after
    assert h2.filter("id = 3").count() == 2


def test_scd2_sink_over_batches(spark, tmp_path):
    from sqlserver_pg_cdc_spark.streaming.scd2 import Scd2ParquetSink

    sink = Scd2ParquetSink(spark, str(tmp_path / "hist"), ["id"])
    b1 = spark.createDataFrame([(1, "a", 10, "c"), (2, "b", 11, "c")], SCHEMA)
    b2 = spark.createDataFrame([(1, "a2", 20, "u"), (2, None, 21, "d")], SCHEMA)
    sink(b1, 0)
    sink(b2, 1)
    sink(b2, 1)  # replay converges
    cur = {(r["id"], r["name"]) for r in sink.current().collect()}
    assert cur == {(1, "a2")}
    assert sink.history().count() == 4  # 2 + update + tombstone
