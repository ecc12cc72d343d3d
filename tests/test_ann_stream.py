"""Streaming-maintained ANN index: streamed-equals-one-shot, upsert
replaces stale band keys, end-to-end writeStream, and probe parity with
the batch-built index path."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators import dedup as DD


def _vecs(spark, ids, dim=8, bump=None):
    rows = []
    for i in ids:
        v = [float((i * 31 + j * 7) % 13) - 6.0 for j in range(dim)]
        if bump is not None and i in bump:
            v = [x + 100.0 for x in v]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _sink(spark, tmp_path, **kw):
    from sqlserver_pg_cdc_spark.streaming.ann import AnnIndexSink

    kw.setdefault("bands", 4)
    kw.setdefault("planes_per_band", 4)
    kw.setdefault("dim", 8)
    kw.setdefault("n_partitions", 8)
    return AnnIndexSink(
        spark, str(tmp_path / "ann_state"), "vec_id", "embedding", **kw
    )


def _index_set(df):
    return {(r["doc"], r["band"], r["bkt"]) for r in df.collect()}


def test_streamed_index_equals_one_shot(spark, tmp_path):
    all_v = _vecs(spark, range(60))
    sink = _sink(spark, tmp_path)
    for b, pred in enumerate(["vec_id % 3 = 0", "vec_id % 3 = 1", "vec_id % 3 = 2"]):
        sink(all_v.filter(pred), b)
    one_shot = DD.embedding_band_index(
        all_v, "vec_id", "embedding", bands=4, planes_per_band=4, dim=8
    )
    assert _index_set(sink.index()) == _index_set(one_shot)


def test_update_replaces_stale_band_keys(spark, tmp_path):
    """Re-ingesting a doc with a CHANGED vector must atomically replace
    its band keys — no stale buckets from the old vector survive."""
    sink = _sink(spark, tmp_path)
    sink(_vecs(spark, range(20)), 0)
    changed = _vecs(spark, [3, 7], bump={3, 7})
    sink(changed, 1)
    want_changed = DD.embedding_band_index(
        changed, "vec_id", "embedding", bands=4, planes_per_band=4, dim=8
    )
    got = sink.index()
    got_37 = _index_set(got.filter(F.col("doc").isin(3, 7)))
    assert got_37 == _index_set(want_changed)
    # every doc still has exactly `bands` keys (one row per doc upsert)
    per_doc = {r["doc"]: r["n"] for r in got.groupBy("doc").agg(F.count("*").alias("n")).collect()}
    assert set(per_doc) == set(range(20)) and all(n == 4 for n in per_doc.values())
    # stale replay of batch 0 (older lsn) must not resurrect old vectors
    sink(_vecs(spark, range(20)), 0)
    assert _index_set(sink.index().filter(F.col("doc").isin(3, 7))) == got_37


def test_streamed_index_end_to_end_writestream(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    spool = tmp_path / "spool"
    os.makedirs(spool)
    all_ids = list(range(40))
    for fname, ids in (("a.json", all_ids[:25]), ("b.json", all_ids[25:])):
        rows = _vecs(spark, ids).collect()
        with open(spool / fname, "w") as f:
            for r in rows:
                f.write(json.dumps({"vec_id": r["vec_id"], "embedding": list(r["embedding"])}) + "\n")
    q = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(str(spool))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    one_shot = DD.embedding_band_index(
        _vecs(spark, all_ids), "vec_id", "embedding", bands=4, planes_per_band=4, dim=8
    )
    assert _index_set(sink.index()) == _index_set(one_shot)


def test_near_dups_against_streamed_index_matches_batch_path(spark, tmp_path):
    corpus = _vecs(spark, range(50))
    sink = _sink(spark, tmp_path)
    sink(corpus.filter("vec_id < 30"), 0)
    sink(corpus.filter("vec_id >= 30"), 1)
    new = corpus.filter("vec_id < 10").withColumn("vec_id", F.col("vec_id") + 1000)
    got = sink.near_dups(new, threshold=0.95)
    batch_index = DD.embedding_band_index(
        corpus, "vec_id", "embedding", bands=4, planes_per_band=4, dim=8
    )
    want = DD.embedding_incremental_near_dup(
        new, corpus, batch_index, "vec_id", "embedding",
        threshold=0.95, bands=4, planes_per_band=4, dim=8,
    )
    gm = {(r["a"], r["b"]): r["cosine"] for r in got.collect()}
    wm = {(r["a"], r["b"]): r["cosine"] for r in want.collect()}
    assert gm == wm and len(gm) >= 10  # every re-keyed copy finds its source
    got.unpersist(); want.unpersist()


def test_cdc_deletes_drop_from_index_and_lsn_guard_holds(spark, tmp_path):
    """deleted_col makes the sink CDC-complete: a delete (even with a
    NULL before-image vector) removes the doc from index()/vectors()/
    near_dups(); a STALE update cannot resurrect it; a NEWER re-insert
    brings it back."""
    from sqlserver_pg_cdc_spark.streaming.ann import AnnIndexSink

    def ch(spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, lsn long, __deleted string"
        )

    def vec(i, bump=0.0):
        return [float((i * 31 + j * 7) % 13) - 6.0 + bump for j in range(8)]

    sink = AnnIndexSink(
        spark, str(tmp_path / "st"), "vec_id", "embedding",
        lsn_col="lsn", deleted_col="__deleted",
        bands=4, planes_per_band=4, dim=8, n_partitions=8,
    )
    sink(ch(spark, [(i, vec(i), 10 + i, "false") for i in range(20)]), 0)
    # delete doc 3 with a NULL before image, doc 7 with its vector
    sink(ch(spark, [(3, None, 100, "true"), (7, vec(7), 101, "true")]), 1)
    live = {r["vec_id"] for r in sink.vectors().collect()}
    assert 3 not in live and 7 not in live and 5 in live
    assert {r["doc"] for r in sink.index().collect()} == live
    # near_dups of an exact copy of doc 7 finds nothing (7 is deleted)
    probe = spark.createDataFrame([(1007, vec(7))], "vec_id long, embedding array<double>")
    got = sink.near_dups(probe, threshold=0.95)
    assert got.filter(F.col("b") == 7).count() == 0
    got.unpersist()
    # stale update (older LSN than the delete) must NOT resurrect
    sink(ch(spark, [(3, vec(3), 50, "false")]), 2)
    assert 3 not in {r["vec_id"] for r in sink.vectors().collect()}
    # newer re-insert DOES bring it back
    sink(ch(spark, [(3, vec(3, bump=1.0), 200, "false")]), 3)
    back = sink.vectors().filter(F.col("vec_id") == 3).collect()
    assert len(back) == 1 and back[0]["embedding"][0] == vec(3, bump=1.0)[0]


def test_param_mismatch_fails_fast(spark, tmp_path):
    """State built with one LSH parameterization must refuse probes and
    writes from a sink configured differently — the band keys baked into
    the state are meaningless under other hyperplanes."""
    sink = _sink(spark, tmp_path, bands=4)
    sink(_vecs(spark, range(10)), 0)

    wrong = _sink(spark, tmp_path, bands=8)
    with pytest.raises(ValueError, match="different LSH parameters"):
        wrong.index()
    with pytest.raises(ValueError, match="different LSH parameters"):
        wrong(_vecs(spark, [11]), 1)
    wrong_seed = _sink(spark, tmp_path, seed="other")
    with pytest.raises(ValueError, match="different LSH parameters"):
        wrong_seed.near_dups(_vecs(spark, [12]))

    # matching params keep working
    same = _sink(spark, tmp_path)
    assert same.index().count() == 10 * 4


def test_params_file_missing_fails_fast(spark, tmp_path):
    """Partitioned ANN state without its __ann_params.json cannot be
    safely probed (parameters unknowable) — fail, don't guess."""
    sink = _sink(spark, tmp_path)
    sink(_vecs(spark, range(5)), 0)
    os.remove(os.path.join(sink.target_dir, sink._PARAMS_FILE))
    fresh = _sink(spark, tmp_path)
    with pytest.raises(ValueError, match="no __ann_params.json"):
        fresh.index()


# --- streaming-maintained IVF index -----------------------------------------


def _ivf_sink(spark, tmp_path, cents=None, **kw):
    from sqlserver_pg_cdc_spark.operators.similarity import with_ivf_cell
    from sqlserver_pg_cdc_spark.streaming.ann import IvfIndexSink

    if cents is None:
        # deterministic first-k centroids over the full corpus (the
        # test-epoch convention with_ivf_cell uses)
        _, cents = with_ivf_cell(_vecs(spark, range(60)), "vec_id", "embedding", 4)
    kw.setdefault("n_partitions", 8)
    return IvfIndexSink(
        spark, str(tmp_path / "ivf_state"), "vec_id", "embedding", cents, **kw
    )


def test_ivf_streamed_assignments_equal_one_shot(spark, tmp_path):
    from sqlserver_pg_cdc_spark.operators.similarity import with_ivf_cell

    all_v = _vecs(spark, range(60))
    sink = _ivf_sink(spark, tmp_path)
    for b, pred in enumerate(["vec_id % 3 = 0", "vec_id % 3 = 1", "vec_id % 3 = 2"]):
        sink(all_v.filter(pred), b)
    one_shot, _ = with_ivf_cell(
        all_v, "vec_id", "embedding", 4, centroids=sink.centroids()
    )
    got = {(r["id"], r["cell_id"]) for r in sink.assigned().collect()}
    want = {(r["id"], r["cell_id"]) for r in one_shot.collect()}
    assert got == want


def test_ivf_streamed_topk_equals_batch_topk(spark, tmp_path):
    from sqlserver_pg_cdc_spark.operators.similarity import topk_ivf

    all_v = _vecs(spark, range(60))
    sink = _ivf_sink(spark, tmp_path)
    sink(all_v.filter("vec_id % 2 = 0"), 0)
    sink(all_v.filter("vec_id % 2 = 1"), 1)
    queries = _vecs(spark, range(5))
    want = topk_ivf(
        all_v, queries, "vec_id", "embedding", k=5, n_cells=4, n_probe=2,
        centroids=sink.centroids(),
    )
    got = sink.topk(queries, k=5, n_probe=2)
    key = lambda df: {(r["query_id"], r["rank"], r["id"]) for r in df.collect()}
    assert key(got) == key(want)


def test_ivf_update_moves_cell_and_deletes_drop(spark, tmp_path):
    sink = _ivf_sink(spark, tmp_path, deleted_col="__deleted", lsn_col="lsn")
    base = _vecs(spark, range(20)).selectExpr(
        "vec_id", "embedding", "CAST(vec_id AS LONG) AS lsn", "'false' AS __deleted"
    )
    sink(base, 0)
    before = {r["id"]: r["cell_id"] for r in sink.assigned().collect()}
    # vector change re-assigns atomically (one row per doc)
    moved = _vecs(spark, [3], bump={3}).selectExpr(
        "vec_id", "embedding", "CAST(100 AS LONG) AS lsn", "'false' AS __deleted"
    )
    sink(moved, 1)
    after = {r["id"]: r["cell_id"] for r in sink.assigned().collect()}
    assert set(after) == set(before)
    assert all(after[i] == before[i] for i in before if i != 3)
    # soft delete drops from assignments; stale update cannot resurrect
    gone = spark.createDataFrame(
        [(5, None, 200, "true")],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    )
    sink(gone, 2)
    assert 5 not in {r["id"] for r in sink.assigned().collect()}
    sink(base.filter("vec_id = 5"), 3)  # lsn 5 < 200 -> guarded out
    assert 5 not in {r["id"] for r in sink.assigned().collect()}


def test_ivf_epoch_mismatch_fails_fast(spark, tmp_path):
    import pytest as _pytest

    from sqlserver_pg_cdc_spark.operators.similarity import with_ivf_cell

    sink = _ivf_sink(spark, tmp_path)
    sink(_vecs(spark, range(20)), 0)
    _, other = with_ivf_cell(_vecs(spark, range(30, 60)), "vec_id", "embedding", 4)
    wrong = _ivf_sink(spark, tmp_path, cents=other)
    with _pytest.raises(ValueError, match="different epoch"):
        wrong.assigned()
    with _pytest.raises(ValueError, match="different epoch"):
        wrong(_vecs(spark, [99]), 1)


def test_ivf_drift_probe_detects_distribution_shift(spark, tmp_path):
    """A drifted ingest stream (vectors far from the epoch's training
    distribution) must trip the drift probe; a same-distribution stream
    must not."""
    sink = _ivf_sink(spark, tmp_path, lsn_col="lsn")
    base = _vecs(spark, range(30)).selectExpr(
        "vec_id", "embedding", "CAST(vec_id AS LONG) AS lsn"
    )
    sink(base, 0)
    assert sink.capture_baseline() is not None
    # same-distribution ingest: healthy
    more = _vecs(spark, range(30, 45)).selectExpr(
        "vec_id", "embedding", "CAST(vec_id AS LONG) AS lsn"
    )
    sink(more, 1)
    assert sink.drift(tolerance=0.05)["drifted"] is False
    # drifted ingest: shifted far off the unit directions the epoch saw
    drifted = spark.createDataFrame(
        [(1000 + i, [200.0 + 13.0 * i * j for j in range(8)], 2000 + i)
         for i in range(60)],
        "vec_id long, embedding array<double>, lsn long",
    )
    sink(drifted, 2)
    rep = sink.drift(tolerance=0.05)
    assert rep["drifted"] is True and rep["mean_cos"] < rep["baseline_mean_cos"]


def test_ivf_drift_requires_baseline(spark, tmp_path):
    sink = _ivf_sink(spark, tmp_path)
    sink(_vecs(spark, range(10)), 0)
    with pytest.raises(ValueError, match="capture_baseline"):
        sink.drift()


def test_ivf_rotate_epoch_retrains_and_preserves_topk_parity(spark, tmp_path):
    """rotate_epoch: retrain on streamed vectors, bulk-load state into a
    NEW epoch dir (LSNs preserved so the guard still holds), and the new
    epoch's topk equals the batch path with the retrained centroids.
    Soft-deleted docs stay deleted across the rotation."""
    from sqlserver_pg_cdc_spark.operators.similarity import topk_ivf

    sink = _ivf_sink(spark, tmp_path, lsn_col="lsn", deleted_col="__deleted")
    base = _vecs(spark, range(40)).selectExpr(
        "vec_id", "embedding", "CAST(vec_id + 10 AS LONG) AS lsn",
        "'false' AS __deleted",
    )
    sink(base, 0)
    sink.capture_baseline()
    gone = spark.createDataFrame(
        [(5, None, 500, "true")],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    )
    sink(gone, 1)
    fresh = sink.rotate_epoch(str(tmp_path / "epoch2"), n_cells=4)
    # live set preserved, delete preserved
    live = {r["id"] for r in fresh.assigned().collect()}
    assert live == set(range(40)) - {5}
    # LSN guard carried over: stale pre-delete replay cannot resurrect
    fresh(base.filter("vec_id = 5"), 99)
    assert 5 not in {r["id"] for r in fresh.assigned().collect()}
    # topk parity with the batch path under the retrained centroids
    queries = _vecs(spark, range(3))
    want = topk_ivf(
        _vecs(spark, range(40)).filter("vec_id <> 5"), queries,
        "vec_id", "embedding", k=5, n_probe=2, centroids=fresh.centroids(),
    )
    got = fresh.topk(queries, k=5, n_probe=2)
    key = lambda df: {(r["query_id"], r["rank"], r["id"]) for r in df.collect()}
    assert key(got) == key(want)
    # new epoch has its own baseline on disk
    assert os.path.exists(os.path.join(fresh.target_dir, fresh._BASELINE_FILE))


# --- streaming-maintained PQ index -----------------------------------------


def _pq_sink(spark, tmp_path, **kw):
    from sqlserver_pg_cdc_spark.operators.similarity import pq_codebooks
    from sqlserver_pg_cdc_spark.streaming.ann import PqIndexSink

    books = kw.pop("books", None)
    if books is None:
        books = pq_codebooks(
            _vecs(spark, range(60)), "vec_id", "embedding", m_sub=4, k_codes=8
        )
    kw.setdefault("n_partitions", 8)
    return PqIndexSink(
        spark, str(tmp_path / "pq_state"), "vec_id", "embedding", books, **kw
    )


def test_pq_streamed_codes_equal_one_shot(spark, tmp_path):
    from sqlserver_pg_cdc_spark.operators.similarity import pq_encode

    all_v = _vecs(spark, range(60))
    sink = _pq_sink(spark, tmp_path)
    for b, pred in enumerate(["vec_id % 3 = 0", "vec_id % 3 = 1", "vec_id % 3 = 2"]):
        sink(all_v.filter(pred), b)
    one_shot = pq_encode(all_v, "vec_id", "embedding", sink.books)
    got = {(r["id"], tuple(r["codes"])) for r in sink.codes().collect()}
    want = {(r["id"], tuple(r["codes"])) for r in one_shot.collect()}
    assert got == want


def test_pq_streamed_topk_equals_batch_topk(spark, tmp_path):
    from sqlserver_pg_cdc_spark.operators.similarity import topk_pq

    all_v = _vecs(spark, range(60))
    sink = _pq_sink(spark, tmp_path)
    sink(all_v.filter("vec_id % 2 = 0"), 0)
    sink(all_v.filter("vec_id % 2 = 1"), 1)
    queries = _vecs(spark, range(5))
    want = topk_pq(
        all_v, queries, "vec_id", "embedding", k=5, refine=16, books=sink.books
    )
    got = sink.topk(queries, k=5, refine=16)
    key = lambda df: {(r["query_id"], r["rank"], r["id"]) for r in df.collect()}
    assert key(got) == key(want)


def test_pq_update_reencodes_and_deletes_drop(spark, tmp_path):
    sink = _pq_sink(spark, tmp_path, deleted_col="__deleted", lsn_col="lsn")
    base = _vecs(spark, range(20)).selectExpr(
        "vec_id", "embedding", "CAST(vec_id AS LONG) AS lsn", "'false' AS __deleted"
    )
    sink(base, 0)
    before = {r["id"]: tuple(r["codes"]) for r in sink.codes().collect()}
    moved = _vecs(spark, [3], bump={3}).selectExpr(
        "vec_id", "embedding", "CAST(100 AS LONG) AS lsn", "'false' AS __deleted"
    )
    sink(moved, 1)
    after = {r["id"]: tuple(r["codes"]) for r in sink.codes().collect()}
    assert after[3] != before[3]  # re-encoded atomically
    assert {k: v for k, v in after.items() if k != 3} == {
        k: v for k, v in before.items() if k != 3
    }
    # CDC delete (NULL vector before-image) drops from the queryable state
    dels = spark.createDataFrame(
        [(5, None, 200, "true")],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    )
    sink(dels, 2)
    live = {r["id"] for r in sink.codes().collect()}
    assert 5 not in live and 3 in live
    # stale pre-delete replay cannot resurrect
    sink(base.filter("vec_id = 5"), 3)
    assert 5 not in {r["id"] for r in sink.codes().collect()}


def test_pq_epoch_mismatch_fails_fast(spark, tmp_path):
    from sqlserver_pg_cdc_spark.operators.similarity import pq_codebooks

    sink = _pq_sink(spark, tmp_path)
    sink(_vecs(spark, range(20)), 0)
    other_books = pq_codebooks(
        _vecs(spark, range(100, 140)), "vec_id", "embedding", m_sub=4, k_codes=8
    )
    with pytest.raises(ValueError, match="codebook epoch"):
        _pq_sink(spark, tmp_path, books=other_books).codes()


def test_pq_drift_probe_detects_distribution_shift(spark, tmp_path):
    """A drifted ingest stream (vectors far off the codebooks' training
    distribution reconstruct poorly) must trip the drift probe; a
    same-distribution stream must not."""
    sink = _pq_sink(spark, tmp_path, lsn_col="lsn")
    base = _vecs(spark, range(30)).selectExpr(
        "vec_id", "embedding", "CAST(vec_id AS LONG) AS lsn"
    )
    sink(base, 0)
    assert sink.capture_baseline() is not None
    more = _vecs(spark, range(30, 45)).selectExpr(
        "vec_id", "embedding", "CAST(vec_id AS LONG) AS lsn"
    )
    sink(more, 1)
    assert sink.drift(tolerance=0.05)["drifted"] is False
    drifted = spark.createDataFrame(
        [(1000 + i, [200.0 + 13.0 * i * j for j in range(8)], 2000 + i)
         for i in range(60)],
        "vec_id long, embedding array<double>, lsn long",
    )
    sink(drifted, 2)
    rep = sink.drift(tolerance=0.05)
    assert rep["drifted"] is True and rep["mean_cos"] < rep["baseline_mean_cos"]


def test_pq_drift_requires_baseline(spark, tmp_path):
    sink = _pq_sink(spark, tmp_path)
    sink(_vecs(spark, range(10)), 0)
    with pytest.raises(ValueError, match="capture_baseline"):
        sink.drift()


def test_pq_rotate_epoch_retrains_and_preserves_topk_parity(spark, tmp_path):
    """rotate_epoch: retrain books on streamed vectors, bulk-load state
    into a NEW epoch dir (LSNs preserved so the guard still holds), and
    the new epoch's topk equals the batch path with the retrained books.
    Soft-deleted docs stay deleted across the rotation."""
    from sqlserver_pg_cdc_spark.operators.similarity import topk_pq

    sink = _pq_sink(spark, tmp_path, lsn_col="lsn", deleted_col="__deleted")
    base = _vecs(spark, range(40)).selectExpr(
        "vec_id", "embedding", "CAST(vec_id + 10 AS LONG) AS lsn",
        "'false' AS __deleted",
    )
    sink(base, 0)
    sink.capture_baseline()
    gone = spark.createDataFrame(
        [(5, None, 500, "true")],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    )
    sink(gone, 1)
    fresh = sink.rotate_epoch(str(tmp_path / "epoch2"), m_sub=4, k_codes=8)
    live = {r["id"] for r in fresh.codes().collect()}
    assert live == set(range(40)) - {5}
    # LSN guard carried over: stale pre-delete replay cannot resurrect
    fresh(base.filter("vec_id = 5"), 99)
    assert 5 not in {r["id"] for r in fresh.codes().collect()}
    # topk parity with the batch path under the retrained books
    queries = _vecs(spark, range(3))
    want = topk_pq(
        _vecs(spark, range(40)).filter("vec_id <> 5"), queries,
        "vec_id", "embedding", k=5, refine=16, books=fresh.books,
    )
    got = fresh.topk(queries, k=5, refine=16)
    key = lambda df: {(r["query_id"], r["rank"], r["id"]) for r in df.collect()}
    assert key(got) == key(want)
    # new epoch has its own baseline on disk
    assert os.path.exists(os.path.join(fresh.target_dir, fresh._BASELINE_FILE))


# --- AnnGateSink: ingest-time embedding near-dup gate ------------------------


def _gate(spark, tmp_path, **kw):
    from sqlserver_pg_cdc_spark.streaming.ann import AnnGateSink

    kw.setdefault("bands", 4)
    kw.setdefault("planes_per_band", 4)
    kw.setdefault("dim", 8)
    kw.setdefault("n_partitions", 8)
    kw.setdefault("threshold", 0.99)
    return AnnGateSink(
        spark, str(tmp_path / "eg_state"), str(tmp_path / "eg_dups"),
        "vec_id", "embedding", **kw
    )


def _dup_map(gate):
    log = gate.dup_log()
    return {
        r["doc"]: (r["dup_of"], r["kind"], r["__batch_id"])
        for r in log.collect()
    }


def test_ann_gate_cross_and_within_batch_rejection(spark, tmp_path):
    gate = _gate(spark, tmp_path)
    # the _vecs pattern has period 13 in the id, so 0..12 are distinct
    b0 = _vecs(spark, range(0, 13))
    gate(b0, 0)
    assert _dup_map(gate) == {}  # distinct vectors: all indexed
    # batch 1: copy of indexed vec 3 (re-keyed 103), plus a same-batch
    # pair (copies of vec 200's pattern at ids 200/201... use identical
    # vectors via bump trick): build explicitly
    rows = [
        (103, [float((3 * 31 + j * 7) % 13) - 6.0 for j in range(8)]),  # = vec 3
        (200, [1.0] * 8),
        (201, [1.0] * 8),  # within-batch exact copy of 200
        (300, [9.0, -3.0, 2.0, 7.0, -1.0, 0.5, 4.0, -8.0]),  # unique
    ]
    b1 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    gate(b1, 1)
    dups = _dup_map(gate)
    assert dups[103] == (3, "corpus", 1)
    assert dups[201] == (200, "batch", 1)
    assert 200 not in dups and 300 not in dups
    # survivors (and only survivors) are indexed
    indexed = {r["vec_id"] for r in gate.vectors().collect()}
    assert 200 in indexed and 300 in indexed
    assert 103 not in indexed and 201 not in indexed
    # the next batch probes against the grown corpus: a copy of 300
    b2 = spark.createDataFrame(
        [(400, [9.0, -3.0, 2.0, 7.0, -1.0, 0.5, 4.0, -8.0])],
        "vec_id long, embedding array<double>",
    )
    gate(b2, 2)
    assert _dup_map(gate)[400] == (300, "corpus", 2)


def test_ann_gate_best_match_max_cosine_min_id(spark, tmp_path):
    """dup_of picks the highest cosine; exact ties break to the
    smallest indexed id."""
    gate = _gate(spark, tmp_path, threshold=0.5)
    b0 = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # tie with 1
            (5, [1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # cos ~0.707
        ],
        "vec_id long, embedding array<double>",
    )
    # NOTE ids 1 and 2 are identical so batch-0 clustering rejects 2;
    # index = {1, 5}
    gate(b0, 0)
    assert _dup_map(gate)[2] == (1, "batch", 0)
    probe = spark.createDataFrame(
        [(9, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    gate(probe, 1)
    assert _dup_map(gate)[9] == (1, "corpus", 1)  # cos 1.0 beats 0.707


def test_ann_gate_replay_rewrites_generation(spark, tmp_path):
    gate = _gate(spark, tmp_path)
    gate(_vecs(spark, range(10)), 0)
    b1 = spark.createDataFrame(
        [(100, [float((1 * 31 + j * 7) % 13) - 6.0 for j in range(8)])],
        "vec_id long, embedding array<double>",
    )
    gate(b1, 1)
    n1 = gate.dup_log().count()
    gate(b1, 1)  # Structured Streaming replay: same batch id
    assert gate.dup_log().count() == n1  # overwritten, not appended
    assert _dup_map(gate)[100] == (1, "corpus", 1)


def test_ann_gate_cdc_deletes_bypass_probe(spark, tmp_path):
    gate = _gate(spark, tmp_path, deleted_col="__deleted", lsn_col="lsn")
    b0 = _vecs(spark, range(10)).select(
        "vec_id", "embedding",
        F.lit(1).alias("lsn"), F.lit("false").alias("__deleted"),
    )
    gate(b0, 0)
    # delete vec 1 (no vector payload) + a copy of vec 1 in the same
    # batch: the delete must reach the index; the copy no longer has a
    # live corpus twin BUT the delete rides the same batch — gate order
    # probes first against the PRIOR state, so the copy still rejects
    delete = spark.createDataFrame(
        [(1, None, 2, "true")],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    )
    gate(delete, 1)
    live = {r["vec_id"] for r in gate.vectors().collect()}
    assert 1 not in live and 0 in live
    # a fresh copy of the DELETED vector now indexes cleanly (nothing
    # live to collide with)
    copy = spark.createDataFrame(
        [(500, [float((1 * 31 + j * 7) % 13) - 6.0 for j in range(8)], 3, "false")],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    )
    gate(copy, 2)
    assert 500 in {r["vec_id"] for r in gate.vectors().collect()}
    assert 500 not in _dup_map(gate)


def test_ann_gate_writestream_e2e(spark, tmp_path):
    """Real Structured Streaming drive of the embedding gate: one file
    per micro-batch through foreachBatch; the second file's copy of a
    first-file vector rejects cross-corpus, and the indexed corpus
    equals accepted survivors only."""
    import json as _json
    import os

    gate = _gate(spark, tmp_path, threshold=0.99)
    spool = tmp_path / "spool"
    os.makedirs(spool)
    base = _vecs(spark, range(0, 13)).collect()
    with open(spool / "a.json", "w") as f:
        for r in base:
            f.write(_json.dumps(
                {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
            ) + "\n")
    with open(spool / "b.json", "w") as f:
        # 100 copies vec 2's pattern (reject); 300 is novel (accept)
        f.write(_json.dumps(
            {"vec_id": 100,
             "embedding": [float((2 * 31 + j * 7) % 13) - 6.0 for j in range(8)]}
        ) + "\n")
        f.write(_json.dumps({"vec_id": 300, "embedding": [5.0] * 8}) + "\n")
    q = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(str(spool))
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dups = _dup_map(gate)
    assert dups[100][:2] == (2, "corpus")
    indexed = {r["vec_id"] for r in gate.vectors().collect()}
    assert 300 in indexed and 100 not in indexed and len(indexed) == 14


# --- streaming-maintained IVF-PQ index ---------------------------------------


def _ivfpq_inputs(spark, ids, n_cells=4, m_sub=4, k_codes=8):
    """Deterministic (cells, books) the test shares between the sink and
    the one-shot batch path."""
    from sqlserver_pg_cdc_spark.functions.vectors import dot, vsub
    from sqlserver_pg_cdc_spark.operators.similarity import (
        pq_codebooks,
        with_ivf_cell,
    )

    vecs = _vecs(spark, ids)
    assigned, cents = with_ivf_cell(vecs, "vec_id", "embedding", n_cells)
    cvt = cents.select("cell_id", F.col("cv").alias("__cv"))
    resid = assigned.join(F.broadcast(cvt), "cell_id").select(
        "id", vsub("v", "__cv").alias("r")
    )
    books = pq_codebooks(resid, "id", "r", m_sub, k_codes)
    return vecs, cents, books


def _ivfpq_sink(spark, tmp_path, cents, books, name="ivfpq_state", **kw):
    from sqlserver_pg_cdc_spark.streaming.ann import IvfPqIndexSink

    kw.setdefault("n_partitions", 8)
    return IvfPqIndexSink(
        spark, str(tmp_path / name), "vec_id", "embedding", cents, books, **kw
    )


def test_ivfpq_streamed_topk_equals_batch(spark, tmp_path):
    from sqlserver_pg_cdc_spark.operators.similarity import topk_ivfpq

    all_v, cents, books = _ivfpq_inputs(spark, range(60))
    sink = _ivfpq_sink(spark, tmp_path, cents, books)
    for b, pred in enumerate(
        ["vec_id % 3 = 0", "vec_id % 3 = 1", "vec_id % 3 = 2"]
    ):
        sink(all_v.filter(pred), b)
    queries = _vecs(spark, range(5))
    want = topk_ivfpq(
        all_v, queries, "vec_id", "embedding", k=5, n_cells=4, n_probe=2,
        m_sub=4, k_codes=8, refine=16, centroids=cents, books=books,
    )
    got = sink.topk(queries, k=5, n_probe=2, refine=16)
    key = lambda df: {(r["query_id"], r["rank"], r["id"]) for r in df.collect()}
    assert key(got) == key(want)


def test_ivfpq_update_delete_and_epoch_guard(spark, tmp_path):
    import pytest as _pytest

    all_v, cents, books = _ivfpq_inputs(spark, range(20))
    sink = _ivfpq_sink(
        spark, tmp_path, cents, books,
        lsn_col="lsn", deleted_col="__deleted",
    )
    base = all_v.selectExpr(
        "vec_id", "embedding", "CAST(vec_id AS LONG) AS lsn",
        "'false' AS __deleted",
    )
    sink(base, 0)
    before = {r["id"]: (r["cell_id"], tuple(r["codes"]))
              for r in sink.codes().collect()}
    moved = _vecs(spark, [3], bump={3}).selectExpr(
        "vec_id", "embedding", "CAST(100 AS LONG) AS lsn",
        "'false' AS __deleted",
    )
    sink(moved, 1)
    after = {r["id"]: (r["cell_id"], tuple(r["codes"]))
             for r in sink.codes().collect()}
    assert after[3] != before[3]  # re-assigned + re-encoded atomically
    assert {k: v for k, v in after.items() if k != 3} == {
        k: v for k, v in before.items() if k != 3
    }
    dels = spark.createDataFrame(
        [(5, None, 200, "true")],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    )
    sink(dels, 2)
    assert 5 not in {r["id"] for r in sink.codes().collect()}
    sink(base.filter("vec_id = 5"), 3)  # stale replay: guarded out
    assert 5 not in {r["id"] for r in sink.codes().collect()}
    # epoch guard: different books fail fast
    _, cents2, books2 = _ivfpq_inputs(spark, range(100, 140))
    with _pytest.raises(ValueError, match="different epoch"):
        _ivfpq_sink(spark, tmp_path, cents, books2,
                    lsn_col="lsn", deleted_col="__deleted").codes()


def test_ivfpq_drift_and_rotation(spark, tmp_path):
    """Full drift discipline on the composite index: same-distribution
    ingest reads healthy, a shifted stream trips the probe, rotation
    retrains BOTH cells and books and preserves live/deleted state under
    the LSN guard with topk parity against the new-epoch batch path."""
    from sqlserver_pg_cdc_spark.operators.similarity import topk_ivfpq

    all_v, cents, books = _ivfpq_inputs(spark, range(40))
    sink = _ivfpq_sink(spark, tmp_path, cents, books, lsn_col="lsn",
                       deleted_col="__deleted")
    base = all_v.selectExpr(
        "vec_id", "embedding", "CAST(vec_id + 10 AS LONG) AS lsn",
        "'false' AS __deleted",
    )
    sink(base, 0)
    assert sink.capture_baseline() is not None
    more = _vecs(spark, range(40, 55)).selectExpr(
        "vec_id", "embedding", "CAST(vec_id AS LONG) AS lsn",
        "'false' AS __deleted",
    )
    sink(more, 1)
    assert sink.drift(tolerance=0.05)["drifted"] is False
    drifted = spark.createDataFrame(
        [(1000 + i, [200.0 + 13.0 * i * j for j in range(8)], 2000 + i,
          "false") for i in range(60)],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    )
    sink(drifted, 2)
    rep = sink.drift(tolerance=0.05)
    assert rep["drifted"] is True and rep["mean_cos"] < rep["baseline_mean_cos"]
    # retire one doc, then rotate
    sink(spark.createDataFrame(
        [(5, None, 5000, "true")],
        "vec_id long, embedding array<double>, lsn long, __deleted string",
    ), 3)
    fresh = sink.rotate_epoch(
        str(tmp_path / "epoch2"), n_cells=4, m_sub=4, k_codes=8,
    )
    live = {r["id"] for r in fresh.codes().collect()}
    assert 5 not in live and 3 in live and 1000 in live
    # LSN guard carried: stale pre-delete replay cannot resurrect
    fresh(base.filter("vec_id = 5"), 99)
    assert 5 not in {r["id"] for r in fresh.codes().collect()}
    # topk parity with the batch path under the NEW epoch
    queries = _vecs(spark, range(3))
    survivors = fresh.vectors()
    want = topk_ivfpq(
        survivors, queries, "vec_id", "embedding", k=5, n_probe=2,
        refine=16, centroids=fresh.centroids(), books=fresh._books,
    )
    got = fresh.topk(queries, k=5, n_probe=2, refine=16)
    key = lambda df: {(r["query_id"], r["rank"], r["id"]) for r in df.collect()}
    assert key(got) == key(want)
    assert os.path.exists(os.path.join(fresh.target_dir, fresh._BASELINE_FILE))


def test_ann_gate_zero_vector_singleton_survives_quietly(spark, tmp_path):
    """Degenerate payload: a zero vector's self-cosine is an ANSI 0/0,
    so no gate path may evaluate a score for a doc that found no banded
    candidate (the template's quotient, when a family enables one,
    additionally skips self-scores for singleton groups). The zero
    vector must survive un-gated while an identical non-zero pair in
    the same batch still collapses to its minimum id."""
    gate = _gate(spark, tmp_path)
    z = [0.0] * 8
    v = [1.0, 2.0, 0.5, 0.0, 3.0, 1.0, 0.25, 4.0]
    # w shares no hyperplane bucket risk with z mattering: the law
    # under test is only that the SINGLETON zero group is never scored
    gate(
        spark.createDataFrame(
            [(1, z), (3, v), (4, v)],
            "vec_id long, embedding array<double>",
        ),
        0,
    )
    dups = _dup_map(gate)
    assert 1 not in dups  # zero singleton survives, nothing evaluated
    assert dups[4] == (3, "batch", 0)
    st = {r["doc"] for r in gate._live_state().collect()}
    assert st == {1, 3}
