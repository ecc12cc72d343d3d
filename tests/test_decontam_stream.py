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


# --- SemanticDecontamGate ----------------------------------------------------


def _svecs(spark, ids, dim=8):
    rows = [
        (i, [float((i * 31 + j * 7) % 13) - 6.0 for j in range(dim)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _sem_setup(spark, tmp_path, threshold=0.999):
    from sqlserver_pg_cdc_spark.streaming.ann import AnnIndexSink
    from sqlserver_pg_cdc_spark.streaming.decontam import SemanticDecontamGate

    idx = AnnIndexSink(
        spark, str(tmp_path / "sem_eval"), "vec_id", "embedding",
        lsn_col="lsn", bands=4, planes_per_band=8, dim=8,
        n_partitions=4, deleted_col="__deleted",
    )
    gate = SemanticDecontamGate(
        idx, str(tmp_path / "sem_acc"), str(tmp_path / "sem_quar"),
        threshold=threshold,
    )
    return idx, gate


def _batch_semantic(spark, corpus, eval_live, threshold):
    """Independent batch-path recomputation: index built from the raw
    eval frame, probe through the batch operators."""
    from sqlserver_pg_cdc_spark.operators import dedup as DD

    index = DD.embedding_band_index(
        eval_live, "vec_id", "embedding", bands=4, planes_per_band=8, dim=8
    )
    pairs = DD.embedding_incremental_near_dup(
        corpus, eval_live, index, "vec_id", "embedding",
        threshold=threshold, bands=4, planes_per_band=8, dim=8,
    )
    return {r["a"] for r in pairs.select("a").distinct().collect()}


def test_semantic_gate_streamed_equals_batch(spark, tmp_path):
    """The streamed gate's quarantine set equals the batch semantic
    decontamination recomputed against the same eval set."""
    idx, gate = _sem_setup(spark, tmp_path)
    ev = _svecs(spark, range(10)).selectExpr(
        "vec_id", "embedding", "CAST(1 AS LONG) AS lsn",
        "'false' AS __deleted",
    )
    idx(ev, 0)
    leaked = _svecs(spark, range(5)).withColumn(
        "vec_id", F.col("vec_id") + 1000
    )
    corpus = leaked.unionByName(_svecs(spark, range(100, 110)))
    gate(corpus, 0)
    want = _batch_semantic(spark, corpus, _svecs(spark, range(10)), 0.999)
    quar = gate.quarantine_log()
    got = set() if quar is None else {r["vec_id"] for r in quar.collect()}
    assert got == want
    assert {1000 + i for i in range(5)} <= got  # the planted leaks
    # accepted + quarantined partition the batch exactly
    acc = {r["vec_id"] for r in gate.accepted().collect()}
    assert acc | got == {r["vec_id"] for r in corpus.collect()}
    assert acc & got == set()
    # evidence columns present
    if quar is not None:
        row = quar.filter("vec_id = 1000").collect()[0]
        assert row["n_eval_hits"] >= 1 and row["max_cosine"] >= 0.999


def test_semantic_gate_eval_retirement_stops_contaminating(spark, tmp_path):
    """A retired (CDC soft-deleted) eval vector stops quarantining its
    copies — parity with the batch path on the post-delete eval set."""
    idx, gate = _sem_setup(spark, tmp_path)
    ev = _svecs(spark, range(10)).selectExpr(
        "vec_id", "embedding", "CAST(1 AS LONG) AS lsn",
        "'false' AS __deleted",
    )
    idx(ev, 0)
    dels = spark.createDataFrame(
        [(i, None, 2, "true") for i in range(3)],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    )
    idx(dels, 1)
    copies = _svecs(spark, range(5)).withColumn(
        "vec_id", F.col("vec_id") + 2000
    )
    gate(copies, 0)
    want = _batch_semantic(
        spark, copies, _svecs(spark, range(3, 10)), 0.999
    )
    quar = gate.quarantine_log()
    got = set() if quar is None else {r["vec_id"] for r in quar.collect()}
    assert got == want
    assert {2003, 2004} <= got          # copies of LIVE eval vectors
    assert not ({2000, 2001, 2002} & got)  # copies of RETIRED ones pass


def test_semantic_gate_replay_and_compaction(spark, tmp_path):
    idx, gate = _sem_setup(spark, tmp_path)
    ev = _svecs(spark, range(6)).selectExpr(
        "vec_id", "embedding", "CAST(1 AS LONG) AS lsn",
        "'false' AS __deleted",
    )
    idx(ev, 0)
    b0 = _svecs(spark, [0]).withColumn("vec_id", F.lit(500).cast("long"))
    b1 = _svecs(spark, [1]).withColumn("vec_id", F.lit(600).cast("long"))
    gate(b0, 0)
    gate(b1, 1)
    before = sorted(
        (r["vec_id"], r["__batch_id"]) for r in gate.quarantine_log().collect()
    )
    gate(b0, 0)  # replay rewrites its own generation
    assert sorted(
        (r["vec_id"], r["__batch_id"]) for r in gate.quarantine_log().collect()
    ) == before
    res = gate.compact_logs(0)
    assert res["quarantine"]["compacted_batches"] == 1
    assert sorted(
        (r["vec_id"], r["__batch_id"]) for r in gate.quarantine_log().collect()
    ) == before


def test_semantic_gate_empty_eval_accepts_everything(spark, tmp_path):
    idx, gate = _sem_setup(spark, tmp_path)
    corpus = _svecs(spark, range(5))
    gate(corpus, 0)
    assert gate.quarantine_log() is None
    assert {r["vec_id"] for r in gate.accepted().collect()} == set(range(5))
