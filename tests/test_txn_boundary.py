"""St8 transaction-boundary grouping: changes of one source transaction
apply all-or-nothing even when a micro-batch boundary splits them.

Reference semantics: Debezium ``provide.transaction.metadata=true``
(docker/configs/debezium/sqlserver-source.json:43), FR-003 (spec.md:118),
integration shape tests/integration/test_replication_flow.py:255.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlserver_pg_cdc_spark.streaming.apply import (
    OP_COL,
    TXN_COL,
    TXN_COUNT_COL,
    TXN_MARKER_OP,
    TransactionalParquetUpsertSink,
    split_transactions,
    unwrap_envelope,
)

PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
    ]
)

ENVELOPE = T.StructType(
    [
        T.StructField("before", PAYLOAD, True),
        T.StructField("after", PAYLOAD, True),
        T.StructField("op", T.StringType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField(
            "transaction",
            T.StructType(
                [
                    T.StructField("id", T.StringType(), True),
                    T.StructField("event_count", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FLAT = (
    "id long, name string, __op string, ts_ms long, lsn long, "
    "__txn_id string, __txn_event_count long"
)


def _data(lsn, rid, name, txn=None, op="c"):
    return (None, (rid, name), op, 1000 + lsn, lsn, (txn, None) if txn else None)


def _marker(lsn, txn, count):
    return (None, None, TXN_MARKER_OP, 1000 + lsn, lsn, (txn, count))


def _unwrapped(spark, rows):
    return unwrap_envelope(spark.createDataFrame(rows, ENVELOPE))


def test_unwrap_carries_transaction_metadata(spark):
    df = _unwrapped(spark, [_data(1, 10, "a", txn="T1"), _marker(2, "T1", 1)])
    assert TXN_COL in df.columns and TXN_COUNT_COL in df.columns
    rows = {r["lsn"]: r for r in df.collect()}
    assert rows[1][TXN_COL] == "T1" and rows[1][TXN_COUNT_COL] is None
    assert rows[2][TXN_COL] == "T1" and rows[2][TXN_COUNT_COL] == 1


def test_unwrap_without_transaction_block_unchanged(spark):
    env_no_txn = T.StructType([f for f in ENVELOPE.fields if f.name != "transaction"])
    df = unwrap_envelope(
        spark.createDataFrame([(None, (1, "a"), "c", 1000, 1)], env_no_txn)
    )
    assert TXN_COL not in df.columns


def test_split_complete_incomplete_and_nontxn(spark):
    df = spark.createDataFrame(
        [
            # T1 complete: 2 data rows + marker saying 2
            (1, "a", "c", 1001, 1, "T1", None),
            (2, "b", "c", 1002, 2, "T1", None),
            (None, None, TXN_MARKER_OP, 1003, 3, "T1", 2),
            # T2 incomplete: marker says 2, only 1 data row arrived
            (3, "c", "c", 1004, 4, "T2", None),
            (None, None, TXN_MARKER_OP, 1005, 5, "T2", 2),
            # T3 incomplete: data but no marker yet
            (4, "d", "c", 1006, 6, "T3", None),
            # non-transactional row: applies immediately
            (5, "e", "c", 1007, 7, None, None),
        ],
        FLAT,
    )
    ready, pending, malformed = split_transactions(df)
    assert sorted(r["lsn"] for r in ready.collect()) == [1, 2, 7]
    # pending keeps T2/T3 data AND the T2 marker; T1's marker is dropped
    pend = pending.collect()
    assert sorted(r["lsn"] for r in pend) == [4, 5, 6]


def test_split_marker_overtakes_data(spark):
    """Kafka only orders within a partition: an END marker may arrive
    before its last data event — the count guard must hold the txn."""
    df = spark.createDataFrame(
        [(None, None, TXN_MARKER_OP, 1001, 1, "T1", 3),
         (1, "a", "c", 1002, 2, "T1", None)],
        FLAT,
    )
    ready, pending, malformed = split_transactions(df)
    assert ready.count() == 0
    assert pending.count() == 2


def test_split_empty_transaction_completes(spark):
    """event_count=0 (filtered tables): marker alone completes and drops."""
    df = spark.createDataFrame(
        [(None, None, TXN_MARKER_OP, 1001, 1, "T0", 0)], FLAT
    )
    ready, pending, malformed = split_transactions(df)
    assert ready.count() == 0 and pending.count() == 0


def _sink(spark, tmp_path):
    return TransactionalParquetUpsertSink(
        spark, str(tmp_path / "target"), ["id"], lsn_col="lsn"
    )


def test_txn_split_across_batches_all_or_nothing(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    # batch 0: first 2 of T1's 3 rows (no marker) + one non-txn row
    sink(
        _unwrapped(
            spark,
            [_data(1, 10, "a", "T1"), _data(2, 11, "b", "T1"), _data(3, 99, "z")],
        ),
        0,
    )
    t = sink.read_target()
    assert [r["id"] for r in t.collect()] == [99]  # NOTHING of T1 visible
    # batch 1: T1's last row + END marker
    sink(
        _unwrapped(spark, [_data(4, 12, "c", "T1"), _marker(5, "T1", 3)]), 1
    )
    ids = sorted(r["id"] for r in sink.read_target().collect())
    assert ids == [10, 11, 12, 99]  # ALL of T1 visible at once
    # spool drained (read as the next batch would)
    pend = sink._read_pending(2)
    assert pend is None or pend.count() == 0


def test_txn_replay_idempotent(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    b0 = _unwrapped(spark, [_data(1, 10, "a", "T1"), _data(2, 11, "b", "T1")])
    b1 = _unwrapped(spark, [_data(3, 12, "c", "T1"), _marker(4, "T1", 3)])
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # checkpoint-recovery replay of the finishing batch
    rows = sink.read_target().collect()
    assert sorted(r["id"] for r in rows) == [10, 11, 12]
    assert len(rows) == 3


def test_split_null_event_count_marker_quarantined(spark):
    """An out-of-spec END marker with NULL event_count makes its
    transaction's completeness unprovable: applying would risk a silent
    partial apply, holding would wedge the spool. All its rows are
    quarantined to `malformed`; unrelated transactions are untouched."""
    df = spark.createDataFrame(
        [(1, "a", "c", 1001, 1, "T1", None),
         (None, None, TXN_MARKER_OP, 1002, 2, "T1", None),
         (2, "b", "c", 1003, 3, "T2", None),
         (None, None, TXN_MARKER_OP, 1004, 4, "T2", 1)],
        FLAT,
    )
    ready, pending, malformed = split_transactions(df)
    assert [r["lsn"] for r in ready.collect()] == [3]  # T2 applies
    assert pending.count() == 0
    assert sorted(r["lsn"] for r in malformed.collect()) == [1, 2]


def test_sink_quarantines_malformed_to_dlq(spark, tmp_path):
    """With a DLQ configured, NULL-count-marker transactions route out
    (never half-applied, never spooled); without one they stay visible
    in the spool."""
    dlq = str(tmp_path / "dlq")
    sink = TransactionalParquetUpsertSink(
        spark, str(tmp_path / "target"), ["id"], lsn_col="lsn", dlq_dir=dlq
    )
    sink(
        _unwrapped(
            spark,
            [_data(1, 10, "a", "T1"), _marker(2, "T1", None), _data(3, 77, "ok")],
        ),
        0,
    )
    assert [r["id"] for r in sink.read_target().collect()] == [77]
    dlq_rows = spark.read.parquet(dlq).collect()
    assert sorted(r["lsn"] for r in dlq_rows) == [1, 2]
    assert all(r["__error_class"] == "MalformedTransactionMarker" for r in dlq_rows)
    pend = sink._read_pending(1)
    assert pend is None or pend.count() == 0


def test_txn_spool_generation_replay_after_spool_swap(spark, tmp_path):
    """The crash window the batch-id generations close: batch N applies
    and writes its spool generation, then dies BEFORE the streaming
    commit. The replay of batch N (same id) must read the pre-batch
    spool state — not the drained generation the crashed attempt wrote —
    so the transaction is still applied exactly once and nothing
    recirculates."""
    sink = _sink(spark, tmp_path)
    b0 = _unwrapped(spark, [_data(1, 10, "a", "T1"), _data(2, 11, "b", "T1")])
    b1 = _unwrapped(spark, [_data(3, 12, "c", "T1"), _marker(4, "T1", 3)])
    sink(b0, 0)
    sink(b1, 1)   # applies T1, writes spool generation b1 (empty)
    sink(b1, 1)   # replay AFTER the spool swap: must re-read generation b0
    rows = sink.read_target().collect()
    assert sorted(r["id"] for r in rows) == [10, 11, 12]
    assert len(rows) == 3
    # next batch sees a drained spool
    pend = sink._read_pending(2)
    assert pend is None or pend.count() == 0


def test_pipeline_transactional_end_to_end(spark, tmp_path):
    """Full streaming path: CdcPipeline(transactional=True) over a file
    spool where one source transaction spans two micro-batches
    (maxFilesPerTrigger=1). The applied target must contain the whole
    transaction exactly once."""
    import json
    import os

    from sqlserver_pg_cdc_spark.streaming.pipeline import CdcPipeline

    spool = tmp_path / "spool"
    os.makedirs(spool)

    def ev(lsn, op, row=None, txn=None, count=None):
        e = {
            "op": op,
            "lsn": lsn,
            "ts_ms": 1_700_000_000_000 + lsn,
            "before": None,
            "after": row,
            "transaction": (
                {"id": txn, "event_count": count} if txn else None
            ),
        }
        return json.dumps(e)

    # file ordering by name: 0.json drains before 1.json
    (spool / "0.json").write_text(
        "\n".join(
            [ev(1, "c", {"id": 10, "name": "a"}, "T1"),
             ev(2, "c", {"id": 11, "name": "b"}, "T1")]
        )
    )
    (spool / "1.json").write_text(
        "\n".join(
            [ev(3, "c", {"id": 12, "name": "c"}, "T1"),
             ev(4, TXN_MARKER_OP, None, "T1", 3)]
        )
    )
    pipe = CdcPipeline(
        spark,
        source_dir=str(spool),
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        payload_schema=PAYLOAD,
        pk_cols=["id"],
        transactional=True,
    )
    pipe.run_available_now(max_files_per_trigger=1)
    rows = pipe.target().collect()
    assert sorted(r["id"] for r in rows) == [10, 11, 12]
    assert all(r["__deleted"] == "false" for r in rows)


def test_txn_update_delete_inside_transaction(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    # seed a row outside any transaction
    sink(_unwrapped(spark, [_data(1, 20, "old")]), 0)
    # one transaction updates 20 and deletes nothing else, split across batches
    sink(_unwrapped(spark, [_data(2, 20, "new", "T9", op="u")]), 1)
    assert [r["name"] for r in sink.read_target().collect()] == ["old"]
    sink(_unwrapped(spark, [_marker(3, "T9", 1)]), 2)
    assert [r["name"] for r in sink.read_target().collect()] == ["new"]
