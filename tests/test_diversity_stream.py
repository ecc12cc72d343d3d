"""Streamed diversity sampling (`streaming/diversity.py`) — round-10
verdict stretch #7: the cluster-balanced selection is maintained
incrementally as streamed state instead of rescanning the corpus per
batch. The invariant under test: at every batch boundary the live
state EQUALS `operators/sampling.diversity_sample` over the union of
everything ingested — including after a Structured Streaming replay of
a middle batch."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.sampling import diversity_sample
from sqlserver_pg_cdc_spark.streaming.diversity import DiversitySampleSink


def _vecs(spark, ids):
    """Deterministic embeddings: 8 loose clusters in 6-d space plus a
    per-doc wobble, so cells are meaningful but not degenerate."""
    rows = []
    for i in ids:
        c = i % 8
        base = [1.0 if d == c % 6 else 0.1 * ((c + d) % 3) for d in range(6)]
        rows.append((i, [b + 0.01 * ((i * (d + 3)) % 7) for d, b in
                         enumerate(base)]))
    return spark.createDataFrame(rows, "doc_id long, v array<double>")


def _sel(sink):
    return {
        (r["doc"], r["cell_id"]) for r in sink.selection().collect()
    }


def _batch_sel(spark, sink, ids, quota):
    cents = spark.read.parquet(sink._centroids_path())
    from sqlserver_pg_cdc_spark.functions.vectors import norm

    cents = cents.select("cell_id", "cv", norm("cv").alias("cn"))
    out = diversity_sample(
        _vecs(spark, ids), "doc_id", "v", quota,
        n_cells=sink.n_cells, centroids=cents,
    )
    return {(r["doc_id"], r["cell_id"]) for r in out.collect()}


def test_streamed_selection_equals_batch_sampler_on_union(spark, tmp_path):
    quota = 3
    sink = DiversitySampleSink(
        spark, str(tmp_path / "div"), "doc_id", "v",
        quota=quota, n_cells=4, n_partitions=4,
    )
    b0 = list(range(0, 40))
    b1 = list(range(40, 90))
    b2 = list(range(90, 140))
    sink(_vecs(spark, b0), 0)
    assert _sel(sink) == _batch_sel(spark, sink, b0, quota)
    sink(_vecs(spark, b1), 1)
    assert _sel(sink) == _batch_sel(spark, sink, b0 + b1, quota)
    sink(_vecs(spark, b2), 2)
    union_sel = _batch_sel(spark, sink, b0 + b1 + b2, quota)
    assert _sel(sink) == union_sel
    # per-cell cardinality: never above quota
    per_cell = (
        sink.selection().groupBy("cell_id").count().collect()
    )
    assert all(r["count"] <= quota for r in per_cell)
    # REPLAY a middle batch (Structured Streaming crash recovery):
    # selection is a monotone top-k fold, so the replay is a no-op
    sink(_vecs(spark, b1), 1)
    assert _sel(sink) == union_sel


def test_eviction_is_monotone_and_tombstoned(spark, tmp_path):
    """A later batch carrying better (lower-hash) members evicts prior
    picks; evicted docs become tombstones (purgeable) and can never
    re-enter — the cell only ever improves."""
    sink = DiversitySampleSink(
        spark, str(tmp_path / "div"), "doc_id", "v",
        quota=2, n_cells=2, n_partitions=4,
    )
    sink(_vecs(spark, list(range(16))), 0)
    first = _sel(sink)
    sink(_vecs(spark, list(range(16, 200))), 1)
    second = _sel(sink)
    assert second == _batch_sel(spark, sink, list(range(200)), 2)
    evicted = {d for d, _ in first} - {d for d, _ in second}
    if evicted:  # tombstoned, not erased: replay-safe under the guard
        st = {r["doc"]: r["__del"] for r in sink.read_target().collect()}
        assert all(st[d] for d in evicted)
    # re-ingesting an evicted doc does not resurrect it
    if evicted:
        d = min(evicted)
        sink(_vecs(spark, [d]), 2)
        assert _sel(sink) == second


def test_centroid_epoch_guard(spark, tmp_path):
    """Reopening the state with a different cell space (or quota) must
    fail fast — a selection folded across two cell spaces is
    meaningless."""
    sink = DiversitySampleSink(
        spark, str(tmp_path / "div"), "doc_id", "v",
        quota=2, n_cells=4, n_partitions=4,
    )
    sink(_vecs(spark, list(range(30))), 0)
    other = DiversitySampleSink(
        spark, str(tmp_path / "div"), "doc_id", "v",
        quota=3, n_cells=4, n_partitions=4,
    )
    with pytest.raises(ValueError, match="different parameters"):
        other(_vecs(spark, list(range(30, 40))), 1)
    # different explicit centroids: sha mismatch
    cents = _vecs(spark, [500, 501, 502, 503]).select(
        F.col("doc_id").alias("cell_id"), F.col("v").alias("cv")
    )
    third = DiversitySampleSink(
        spark, str(tmp_path / "div"), "doc_id", "v",
        quota=2, n_cells=4, centroids=cents, n_partitions=4,
    )
    with pytest.raises(ValueError, match="different parameters"):
        third(_vecs(spark, list(range(40, 50))), 1)


def test_eviction_tombstones_are_purgeable(spark, tmp_path):
    """Day-2 retention composes: evicted selection rows are ordinary
    soft-delete tombstones, so the inherited `purge_tombstones`
    physically drops them past the replay horizon without touching the
    live selection — and the selection survives unchanged."""
    sink = DiversitySampleSink(
        spark, str(tmp_path / "div"), "doc_id", "v",
        quota=2, n_cells=2, n_partitions=4,
    )
    sink(_vecs(spark, list(range(16))), 0)
    sink(_vecs(spark, list(range(16, 200))), 1)
    before = _sel(sink)
    dead = sink.read_target().filter("__del").count()
    assert dead > 0  # batch 1 evicted someone
    out = sink.purge_tombstones(10**9, deleted_col="__del")
    assert out["purged"] == dead
    assert sink.read_target().filter("__del").count() == 0
    assert _sel(sink) == before
