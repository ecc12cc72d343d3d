"""Streaming eval-gram index + decontamination gate: streamed state
matches the batch operator, eval CDC (update/delete) changes gating,
and the gate's accepted/quarantine split is exactly-once under replay."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.decontam import decontaminate
from sqlserver_pg_cdc_spark.streaming.decontam import (
    DecontamGate,
    EvalGramIndexSink,
)

WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _eval_sink(spark, tmp_path, **kw):
    kw.setdefault("k", 3)
    kw.setdefault("n_partitions", 8)
    return EvalGramIndexSink(
        spark, str(tmp_path / "eval_state"), "doc_id", "text", **kw
    )


def test_streamed_contamination_matches_batch_operator(spark, tmp_path):
    eval_rows = [(i, " ".join(WORDS[i % 4 : i % 4 + 5])) for i in range(6)]
    corpus_rows = [
        (100, " ".join(WORDS[0:5])),        # exact eval text -> contaminated
        (101, "zulu yankee xray whiskey victor uniform"),  # clean
        (102, WORDS[1] + " " + WORDS[2] + " " + WORDS[3] + " trailing junk"),
    ]
    sink = _eval_sink(spark, tmp_path)
    sink(_docs(spark, eval_rows[:3]), 0)
    sink(_docs(spark, eval_rows[3:]), 1)
    got = sink.contamination(_docs(spark, corpus_rows)).collect()
    want = decontaminate(
        _docs(spark, corpus_rows), _docs(spark, eval_rows),
        "doc_id", "text", k=3,
    ).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(got) == key(want)


def test_eval_delete_stops_contaminating(spark, tmp_path):
    sink = _eval_sink(spark, tmp_path, lsn_col="lsn", deleted_col="__deleted")
    ev = spark.createDataFrame(
        [(1, " ".join(WORDS[0:4]), 10, "false"),
         (2, "unrelated benchmark words here", 10, "false")],
        "doc_id long, text string, lsn long, __deleted string",
    )
    sink(ev, 0)
    corpus = _docs(spark, [(100, " ".join(WORDS[0:4]))])
    first = sink.contamination(corpus).collect()[0]
    assert first["contaminated"] and first["n_eval_hits"] == 2
    # retire benchmark doc 1 — its grams must leave the probe
    dels = spark.createDataFrame(
        [(1, None, 20, "true")],
        "doc_id long, text string, lsn long, __deleted string",
    )
    sink(dels, 1)
    after = sink.contamination(corpus).collect()[0]
    assert not after["contaminated"] and after["n_eval_hits"] == 0
    # stale replay of the pre-delete state cannot resurrect the grams
    sink(ev.filter("doc_id = 1"), 2)
    again = sink.contamination(corpus).collect()[0]
    assert not again["contaminated"]


def test_gate_splits_and_replay_is_exactly_once(spark, tmp_path):
    sink = _eval_sink(spark, tmp_path)
    sink(_docs(spark, [(1, " ".join(WORDS[0:5]))]), 0)
    gate = DecontamGate(
        sink, str(tmp_path / "accepted"), str(tmp_path / "quarantine")
    )
    batch = _docs(spark, [
        (100, " ".join(WORDS[0:5])),  # contaminated
        (101, "totally clean words nothing shared at all"),
    ])
    gate(batch, 0)
    q = {r["doc_id"]: r for r in gate.quarantine_log().collect()}
    assert set(q) == {100} and q[100]["n_eval_hits"] > 0
    assert {r["doc_id"] for r in gate.accepted().collect()} == {101}
    # replay the same batch id: generations rewritten, not appended
    gate(batch, 0)
    assert [r["doc_id"] for r in gate.quarantine_log().collect()] == [100]
    assert [r["doc_id"] for r in gate.accepted().collect()] == [101]
    # second batch accumulates under a new generation
    gate(_docs(spark, [(200, "more clean text entirely distinct")]), 1)
    assert {r["doc_id"] for r in gate.accepted().collect()} == {101, 200}


def test_gate_empty_eval_accepts_everything(spark, tmp_path):
    sink = _eval_sink(spark, tmp_path)
    gate = DecontamGate(
        sink, str(tmp_path / "accepted"), str(tmp_path / "quarantine")
    )
    gate(_docs(spark, [(1, "anything at all")]), 0)
    assert gate.quarantine_log() is None
    assert {r["doc_id"] for r in gate.accepted().collect()} == {1}


def test_param_mismatch_fails_fast(spark, tmp_path):
    sink = _eval_sink(spark, tmp_path, k=3)
    sink(_docs(spark, [(1, " ".join(WORDS))]), 0)
    with pytest.raises(ValueError, match="gram width"):
        _eval_sink(spark, tmp_path, k=5).grams()
