"""Streaming-maintained MinHash band index (`streaming/minhash.
MinhashIndexSink`): streamed-equals-one-shot, upsert replaces stale
band keys on text change, CDC deletes, LSN guard, parameter guards,
end-to-end writeStream, and probe parity with the batch
`minhash_incremental_dedup` path."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators import dedup as DD

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel", "india", "juliet", "kilo", "lima"]


def _docs(spark, ids, mutate=None):
    rows = []
    for i in ids:
        toks = [WORDS[(i + j * (1 + i % 3)) % len(WORDS)] for j in range(8)]
        if mutate is not None and i in mutate:
            toks = list(reversed(toks)) + ["zulu"]
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sink(spark, tmp_path, **kw):
    from sqlserver_pg_cdc_spark.streaming.minhash import MinhashIndexSink

    kw.setdefault("num_hashes", 16)
    kw.setdefault("bands", 4)
    kw.setdefault("k", 3)
    kw.setdefault("n_partitions", 8)
    return MinhashIndexSink(
        spark, str(tmp_path / "mh_state"), "doc_id", "text", **kw
    )


def _index_set(df):
    return {(r["doc"], r["band_id"], r["band_key"]) for r in df.collect()}


def test_streamed_index_equals_one_shot(spark, tmp_path):
    all_d = _docs(spark, range(60))
    sink = _sink(spark, tmp_path)
    for b, pred in enumerate(["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"]):
        sink(all_d.filter(pred), b)
    one_shot = DD.minhash_index(all_d, "doc_id", "text")
    assert _index_set(sink.index()) == _index_set(one_shot)


def test_update_replaces_stale_band_keys(spark, tmp_path):
    """Re-ingesting a doc with CHANGED text must atomically replace its
    band keys; a stale replay (older lsn) must not resurrect old text."""
    sink = _sink(spark, tmp_path)
    sink(_docs(spark, range(20)), 0)
    changed = _docs(spark, [3, 7], mutate={3, 7})
    sink(changed, 1)
    want_changed = DD.minhash_index(changed, "doc_id", "text")
    got = sink.index()
    got_37 = _index_set(got.filter(F.col("doc").isin(3, 7)))
    assert got_37 == _index_set(want_changed)
    per_doc = {
        r["doc"]: r["n"]
        for r in got.groupBy("doc").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_doc) == set(range(20))
    assert all(n == 4 for n in per_doc.values())
    sink(_docs(spark, range(20)), 0)  # stale replay
    assert _index_set(sink.index().filter(F.col("doc").isin(3, 7))) == got_37


def test_near_dups_against_streamed_index_matches_batch_path(spark, tmp_path):
    corpus = _docs(spark, range(50))
    sink = _sink(spark, tmp_path)
    sink(corpus.filter("doc_id < 30"), 0)
    sink(corpus.filter("doc_id >= 30"), 1)
    new = corpus.filter("doc_id < 10").withColumn(
        "doc_id", F.col("doc_id") + 1000
    )
    got = sink.near_dups(new, threshold=0.5)
    batch_index = DD.minhash_index(corpus, "doc_id", "text")
    want = DD.minhash_incremental_dedup(
        new, corpus, batch_index, "doc_id", "text", threshold=0.5
    )
    gm = {(r["a"], r["b"]): round(r["jaccard"], 9) for r in got.collect()}
    wm = {(r["a"], r["b"]): round(r["jaccard"], 9) for r in want.collect()}
    assert gm == wm and len(gm) >= 10  # every re-keyed copy finds its source
    got.unpersist()
    want.unpersist()


def test_streamed_index_feeds_minhash_incremental_dedup(spark, tmp_path):
    """sink.index() IS the index_df contract of the batch operator:
    `minhash_incremental_dedup` probing streamed state returns exactly
    what it returns with the batch-built index."""
    corpus = _docs(spark, range(40))
    sink = _sink(spark, tmp_path)
    sink(corpus.filter("doc_id % 2 = 0"), 0)
    sink(corpus.filter("doc_id % 2 = 1"), 1)
    new = corpus.filter("doc_id < 8").withColumn(
        "doc_id", F.col("doc_id") + 500
    )
    via_stream = DD.minhash_incremental_dedup(
        new, corpus, sink.index(), "doc_id", "text", threshold=0.5
    )
    via_batch = DD.minhash_incremental_dedup(
        new, corpus, DD.minhash_index(corpus, "doc_id", "text"),
        "doc_id", "text", threshold=0.5,
    )
    sm = {(r["a"], r["b"]): round(r["jaccard"], 9) for r in via_stream.collect()}
    bm = {(r["a"], r["b"]): round(r["jaccard"], 9) for r in via_batch.collect()}
    assert sm == bm and len(sm) >= 8
    via_stream.unpersist()
    via_batch.unpersist()


def test_cdc_deletes_and_lsn_guard(spark, tmp_path):
    """Soft deletes drop docs from index()/shingles()/near_dups() even
    with a NULL before-image text; a stale update cannot resurrect."""
    sink = _sink(spark, tmp_path, lsn_col="lsn", deleted_col="__deleted")
    b0 = _docs(spark, range(12)).select(
        "doc_id", "text", (F.col("doc_id") + 10).alias("lsn"),
        F.lit("false").alias("__deleted"),
    )
    sink(b0, 0)
    dels = spark.createDataFrame(
        [(3, None, 100, "true"), (7, None, 101, "true")],
        "doc_id long, text string, lsn long, __deleted string",
    )
    sink(dels, 1)
    live = {r["doc"] for r in sink.index().select("doc").distinct().collect()}
    assert live == set(range(12)) - {3, 7}
    # near-dup probe of an exact copy of a deleted doc finds nothing
    probe = _docs(spark, [3]).withColumn("doc_id", F.lit(9003))
    res = sink.near_dups(probe, threshold=0.5)
    assert res.filter(F.col("b") == 3).count() == 0
    res.unpersist()
    # stale update (older lsn) cannot resurrect the deleted doc
    stale = _docs(spark, [3]).select(
        "doc_id", "text", F.lit(50).alias("lsn"), F.lit("false").alias("__deleted")
    )
    sink(stale, 2)
    assert 3 not in {
        r["doc"] for r in sink.index().select("doc").distinct().collect()
    }


def test_param_guards(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    sink(_docs(spark, range(10)), 0)
    reopened_bad = _sink(spark, tmp_path, bands=8, num_hashes=16)
    with pytest.raises(ValueError, match="different LSH parameters"):
        reopened_bad.index()
    with pytest.raises(ValueError, match="different LSH parameters"):
        reopened_bad(_docs(spark, range(5)), 1)
    # params file gone but partitions present: refuse to guess
    os.remove(str(tmp_path / "mh_state" / "__minhash_params.json"))
    fresh = _sink(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown"):
        fresh.index()


def test_empty_shingle_docs_own_state_rows(spark, tmp_path):
    """A doc too short to shingle gets an empty band array (never
    collides) but still owns a row — a later text update lands on it."""
    sink = _sink(spark, tmp_path)
    short = spark.createDataFrame(
        [(1, "hi"), (2, " ".join(WORDS[:8]))], "doc_id long, text string"
    )
    sink(short, 0)
    assert sink.index().filter(F.col("doc") == 1).count() == 0
    assert sink.read_target().filter(F.col("doc") == 1).count() == 1
    sink(_docs(spark, [1]), 1)  # text update arrives later
    assert sink.index().filter(F.col("doc") == 1).count() == 4


def test_end_to_end_writestream(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    spool = tmp_path / "spool"
    os.makedirs(spool)
    all_ids = list(range(30))
    for fname, ids in (("a.json", all_ids[:18]), ("b.json", all_ids[18:])):
        rows = _docs(spark, ids).collect()
        with open(spool / fname, "w") as f:
            for r in rows:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(spool))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    one_shot = DD.minhash_index(_docs(spark, all_ids), "doc_id", "text")
    assert _index_set(sink.index()) == _index_set(one_shot)


# --- ingest-time dedup gate --------------------------------------------------


def _udocs(spark, ids):
    """Pairwise-disjoint documents (unique token vocabulary per doc) —
    the gate tests need a corpus with NO accidental near-dups so every
    rejection is one the test planted."""
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(8))) for i in ids]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _gate(spark, tmp_path, **kw):
    from sqlserver_pg_cdc_spark.streaming.minhash import DedupGateSink

    kw.setdefault("n_partitions", 8)
    kw.setdefault("threshold", 0.5)
    return DedupGateSink(
        spark, str(tmp_path / "gate_state"), str(tmp_path / "gate_dups"),
        "doc_id", "text", **kw
    )


def test_gate_rejects_cross_corpus_and_within_batch_dups(spark, tmp_path):
    gate = _gate(spark, tmp_path)
    b0 = _udocs(spark, range(20))
    gate(b0, 0)
    # all unique: everything indexed, nothing logged as corpus dup
    assert {r["doc"] for r in gate.index().select("doc").distinct().collect()} == set(range(20))
    log0 = gate.dup_log()
    assert log0 is None or log0.filter("kind = 'corpus'").count() == 0
    # batch 1: exact copies of indexed docs 3/7 (rejected, kind=corpus),
    # two copies of a NEW doc 100/101 (one within-batch canonical
    # survives), one genuinely new doc 102
    copies = _udocs(spark, [3, 7]).withColumn("doc_id", F.col("doc_id") + 1000)
    t100 = " ".join(WORDS[:9])
    fresh = spark.createDataFrame(
        [(100, t100), (101, t100), (102, "completely distinct words only here "
                                         + " ".join(reversed(WORDS)))],
        "doc_id long, text string",
    )
    gate(copies.unionByName(fresh), 1)
    log = {r["doc"]: (r["dup_of"], r["kind"]) for r in gate.dup_log().collect()}
    assert log[1003] == (3, "corpus") and log[1007] == (7, "corpus")
    assert log[101] == (100, "batch")  # canonical = min id
    idx_docs = {r["doc"] for r in gate.index().select("doc").distinct().collect()}
    assert 1003 not in idx_docs and 1007 not in idx_docs and 101 not in idx_docs
    assert 100 in idx_docs and 102 in idx_docs
    # batch 2 copy of doc 100 (indexed last batch) now rejects as corpus
    gate(spark.createDataFrame([(200, t100)], "doc_id long, text string"), 2)
    log2 = {r["doc"]: (r["dup_of"], r["kind"])
            for r in gate.dup_log().filter("__batch_id = 2").collect()}
    assert log2[200] == (100, "corpus")


def test_gate_replay_overwrites_dup_generation(spark, tmp_path):
    """A Structured Streaming replay re-drives the SAME batch id: the
    dup log generation is rewritten, not appended — exactly-once
    without read-side dedup — and the index converges."""
    gate = _gate(spark, tmp_path)
    gate(_udocs(spark, range(10)), 0)
    dup_batch = _udocs(spark, [2]).withColumn("doc_id", F.lit(500))
    gate(dup_batch, 1)
    first = sorted(tuple(r) for r in gate.dup_log().collect())
    idx_first = {r["doc"] for r in gate.index().select("doc").distinct().collect()}
    gate(dup_batch, 1)  # replay
    assert sorted(tuple(r) for r in gate.dup_log().collect()) == first
    assert {r["doc"] for r in gate.index().select("doc").distinct().collect()} == idx_first


def test_gate_deletes_bypass_probe(spark, tmp_path):
    gate = _gate(spark, tmp_path, lsn_col="lsn", deleted_col="__deleted")
    b0 = _udocs(spark, range(8)).select(
        "doc_id", "text", (F.col("doc_id") + 10).alias("lsn"),
        F.lit("false").alias("__deleted"),
    )
    gate(b0, 0)
    dels = spark.createDataFrame(
        [(4, None, 100, "true")],
        "doc_id long, text string, lsn long, __deleted string",
    )
    gate(dels, 1)
    live = {r["doc"] for r in gate.index().select("doc").distinct().collect()}
    assert live == set(range(8)) - {4}
    # the delete was not logged as a dup
    log = gate.dup_log()
    assert log is None or log.filter("doc = 4").count() == 0


def test_gate_string_ids_deterministic_dup_of_on_tie(spark, tmp_path):
    """Regression (r8 ADVICE): the best-match tie-break used a negated
    id inside max_by — with STRING doc ids (id_col is caller-chosen)
    unary minus casts to double and yields NULL, making dup_of
    nondeterministic on jaccard ties. Plant an exact tie: probe shares
    the same 8-shingle core with two indexed docs, each carrying 3
    extra shingles, so jaccard(P,A) == jaccard(P,B) == 8/11 while
    A-vs-B (8/14) stays under the threshold. dup_of must be the
    lexicographically smallest id, every run."""
    from sqlserver_pg_cdc_spark.streaming.minhash import DedupGateSink

    core = " ".join(f"c{i}" for i in range(10))  # 8 shingles at k=3
    gate = DedupGateSink(
        spark, str(tmp_path / "sgate_state"), str(tmp_path / "sgate_dups"),
        "doc_id", "text", threshold=0.6, n_partitions=4,
    )
    b0 = spark.createDataFrame(
        [("z9", core + " pa1 pa2 pa3"), ("z10", core + " pb1 pb2 pb3")],
        "doc_id string, text string",
    )
    gate(b0, 0)
    idx = {r["doc"] for r in gate.index().select("doc").distinct().collect()}
    assert idx == {"z9", "z10"}  # 8/14 < 0.6: not dups of each other
    gate(
        spark.createDataFrame([("probe", core)], "doc_id string, text string"),
        1,
    )
    log = gate.dup_log().filter("__batch_id = 1").collect()
    assert len(log) == 1
    # string ordering: "z10" < "z9" — the tie-break is on the id's own
    # type, not a numeric cast
    assert (log[0]["doc"], log[0]["dup_of"], log[0]["kind"]) == (
        "probe", "z10", "corpus",
    )
