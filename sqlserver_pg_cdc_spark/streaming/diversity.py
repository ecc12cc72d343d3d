"""Streaming-maintained DIVERSITY SAMPLE: cluster-balanced corpus
selection (`operators/sampling.diversity_sample`) kept continuously up
to date from a document-embedding change stream — round-10 verdict
stretch #7, composing the sampler with the gate family the way the
decontamination gate composed with the eval index.

The batch sampler assigns every vector to its max-cosine IVF cell and
keeps each cell's ``quota`` lowest-content-hash members. Re-running it
per micro-batch over a continuously-ingesting corpus rescans
everything; here the SELECTION ITSELF is the streamed state — at every
batch boundary the live state equals ``diversity_sample`` over the
union of all ingested batches, maintained incrementally:

1. assign the batch to the EPOCH's cells (centroids are fixed per
   epoch, sha-recorded in ``__diversity_params.json`` — the
   `AnnIndexSink` discipline: a selection mixing two cell spaces is
   meaningless; the default first-batch seed law is recorded too);
2. fold the batch's candidates into the standing selection of the
   TOUCHED cells only: union, rank by (content hash, id), keep
   ``quota`` — the top-k-by-hash selection is a greedy matroid, so
   ``select(state ∪ batch) == select(select(all prior) ∪ batch)``:
   incremental == from-scratch, PROVABLY, not approximately;
3. upsert the fresh picks and soft-delete the evicted rows through the
   hash-partitioned LSN-guarded path.

Per-batch work ∝ batch + (touched cells × quota) — never corpus-sized;
the standing state is at most ``n_cells × quota`` live rows plus
tombstones (`purge_tombstones` applies). Structured Streaming replay
is idempotent BY ALGEBRA: a replayed batch's docs are already in the
union, and top-k selection is monotone (an evicted doc can never
re-enter: its cell's member set only ever improves), so the fold
recomputes the identical selection and the upsert no-ops under the
LSN guard.

Reference analog: the reference maintains reconciliation state
incrementally per change batch (src/reconciliation/incremental/
state.py:112-164); here the state is the coverage sample itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.streaming.apply import PartitionedParquetUpsertSink


class DiversitySampleSink(PartitionedParquetUpsertSink):
    """foreachBatch callable maintaining the streamed diversity sample:
    one live state row per SELECTED doc — (doc, cell_id, lsn[, __del]).
    ``selection()`` is the standing sample; it equals
    ``diversity_sample(union of batches, quota, centroids=epoch)`` at
    every batch boundary (pytest-pinned, including mid-stream replay).

    ``centroids``: (cell_id, cv) frame fixing the epoch's cell space;
    None seeds it from the FIRST batch (first ``n_cells`` vectors by
    id — the `with_ivf_cell` deterministic law) and persists it under
    the state dir, so every later batch — and every reopen — assigns
    in the same space."""

    _PARAMS_FILE = "__diversity_params.json"
    _CENTROIDS_DIR = "__centroids"

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str,
        vec_col: str,
        quota: int,
        n_cells: int = 8,
        centroids: DataFrame | None = None,
        dlq_dir: str | None = None,
        n_partitions: int = 32,
    ):
        super().__init__(
            spark, state_dir, ["doc"], lsn_col="lsn",
            dlq_dir=dlq_dir, n_partitions=n_partitions,
        )
        if quota < 1:
            raise ValueError("quota must be >= 1")
        self.id_col = id_col
        self.vec_col = vec_col
        self.quota = int(quota)
        self.n_cells = int(n_cells)
        self._centroids = centroids  # resolved/persisted on first batch

    # -- centroid epoch ------------------------------------------------------

    def _centroid_sha(self, rows) -> str:
        import hashlib

        blob = repr(
            [(r["cell_id"], [float(x) for x in r["cv"]]) for r in rows]
        ).encode()
        return hashlib.sha256(blob).hexdigest()

    def _centroids_path(self) -> str:
        import os

        return os.path.join(self.target_dir, self._CENTROIDS_DIR)

    def _params(self, sha: str) -> dict:
        return {
            "quota": self.quota,
            "n_cells": self.n_cells,
            "id_col": self.id_col,
            "vec_col": self.vec_col,
            "centroid_sha256": sha,
        }

    def _resolve_centroids(self, batch_df: DataFrame) -> DataFrame:
        """The epoch's centroids: the stored epoch when one exists
        (validated against the params sha), else the passed/seeded
        frame, persisted + recorded on first use. Fail fast on any
        mismatch — assignment in a different cell space silently
        produces a meaningless selection."""
        import json
        import os

        from sqlserver_pg_cdc_spark.functions.vectors import norm

        os.makedirs(self.target_dir, exist_ok=True)
        pf = os.path.join(self.target_dir, self._PARAMS_FILE)
        cpath = self._centroids_path()
        if os.path.exists(pf):
            with open(pf) as f:
                stored = json.load(f)
            cents = self.spark.read.parquet(cpath)
            sha = self._centroid_sha(
                sorted(cents.collect(), key=lambda r: r["cell_id"])
            )
            mine = self._params(sha)
            if self._centroids is not None:
                # an explicitly-passed epoch must MATCH the stored one,
                # not be silently ignored in its favor
                mine["centroid_sha256"] = self._centroid_sha(
                    sorted(
                        self._centroids.select("cell_id", "cv").collect(),
                        key=lambda r: r["cell_id"],
                    )
                )
            if stored != mine:
                diff = {
                    k: {"stored": stored.get(k), "sink": v}
                    for k, v in mine.items()
                    if stored.get(k) != v
                }
                raise ValueError(
                    f"diversity state at {self.target_dir} was built "
                    f"with different parameters than this sink: {diff} — "
                    "open it with the recorded parameters or rebuild"
                )
            return cents.select(
                "cell_id", "cv", norm("cv").alias("cn")
            )
        cents = self._centroids
        if cents is None:
            cents = (
                batch_df.filter(F.col(self.vec_col).isNotNull())
                .orderBy(self.id_col)
                .limit(self.n_cells)
                .select(
                    F.col(self.id_col).alias("cell_id"),
                    F.col(self.vec_col).alias("cv"),
                )
            )
        cents.select("cell_id", "cv").write.mode("overwrite").parquet(cpath)
        cents = self.spark.read.parquet(cpath)
        sha = self._centroid_sha(
            sorted(cents.collect(), key=lambda r: r["cell_id"])
        )
        with open(pf, "w") as f:
            json.dump(self._params(sha), f)
        return cents.select("cell_id", "cv", norm("cv").alias("cn"))

    # -- the fold ------------------------------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.streaming.lock import writer_beacon

        with writer_beacon(self.target_dir, "diversity sample batch"):
            self._fold(batch_df, batch_id)

    def _fold(self, batch_df: DataFrame, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.operators.sampling import _hash_bucket
        from sqlserver_pg_cdc_spark.operators.similarity import with_ivf_cell

        cents = self._resolve_centroids(batch_df)
        assigned, _ = with_ivf_cell(
            batch_df.select(self.id_col, self.vec_col),
            self.id_col, self.vec_col, self.n_cells, centroids=cents,
        )
        cand = assigned.select(F.col("id").alias("doc"), "cell_id")
        # fold over TOUCHED cells only: the standing selection holds at
        # most quota rows per cell, so the union the window ranks is
        # (batch + touched_cells * quota) rows — never corpus-sized
        cur = self.read_target()
        if cur is not None:
            live = cur
            if "__del" in cur.columns:
                live = cur.filter(~F.coalesce(F.col("__del"), F.lit(False)))
            touched = cand.select("cell_id").distinct()
            cur_sel = live.join(touched, "cell_id", "left_semi").select(
                "doc", "cell_id"
            )
            union = cur_sel.unionByName(cand).distinct()
        else:
            cur_sel = None
            union = cand.distinct()
        w = Window.partitionBy("cell_id").orderBy(
            _hash_bucket("doc"), F.col("doc")
        )
        sel = (
            union.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= self.quota)
            .select("doc", "cell_id")
        )
        lsn = F.lit(int(batch_id)).cast("long")
        fresh = sel
        if cur_sel is not None:
            fresh = sel.join(cur_sel.select("doc"), "doc", "left_anti")
        rows = fresh.select(
            "doc", "cell_id", lsn.alias("lsn"),
            F.lit(False).alias("__del"),
        )
        if cur_sel is not None:
            evicted = cur_sel.join(
                sel.select("doc"), "doc", "left_anti"
            ).select(
                "doc", "cell_id", lsn.alias("lsn"),
                F.lit(True).alias("__del"),
            )
            rows = rows.unionByName(evicted)
        super().__call__(rows, batch_id)

    # -- query surface ---------------------------------------------------

    def selection(self) -> DataFrame | None:
        """The standing sample: (doc, cell_id) of live selected docs —
        equal to the batch sampler over everything ingested so far."""
        st = self.read_target()
        if st is None:
            return None
        if "__del" in st.columns:
            st = st.filter(~F.coalesce(F.col("__del"), F.lit(False)))
        return st.select("doc", "cell_id")
