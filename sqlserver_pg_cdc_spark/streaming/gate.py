"""Shared skeleton for the ingest-time dedup GATES.

Round 10 shipped three gates — text (`streaming/minhash.DedupGateSink`),
embedding (`streaming/ann.AnnGateSink`), media
(`streaming/media.MediaDedupGateSink`) — each hand-rolling the same
~150-line body: single-writer beacons on both dirs, one
localCheckpoint'd projection, cross-corpus probe with a deterministic
best-match tie-break, within-batch clustering via connected components,
a per-batch-id dup-log generation (exactly-once under replay), and the
survivor upsert. This mixin IS that body; a gate is now just three
hooks —

* ``_gate_surface(live)``: the family's probe frames off the shared
  projection (shingles+bands / vectors+bands / fingerprints+bands);
* ``_gate_cross_pairs(surface, blocks)``: scored ``(a, b, score)``
  candidates of the batch against the STANDING index (None when the
  index is empty);
* ``_gate_batch_pairs(surface, reject_docs, blocks)``: scored
  ``(a, b, score)`` pairs WITHIN the batch remainder, ``a < b``.

Hooks append every frame they persist to ``blocks``; the template
unpersists all of them even when the batch fails mid-gate (the r8
executor-storage-leak discipline). ``_SCORE_COL`` names the similarity
column in the dup log (jaccard / cosine / hamming) and
``_SCORE_BEST_ASC`` its best-match direction (True when SMALLER is
closer — Hamming distance).

Invariants the template enforces identically for every family (these
are what the gates' oracle rows pin):

* deterministic dup_of: best cross-corpus match by score then smallest
  indexed id (``row_number``, never a negated-id ``max_by`` — the id
  may be a string);
* CDC deletes bypass the gate but still reach the index;
* within-batch clusters keep their minimum id; transitively-linked
  losers log a NULL score;
* the dup log's id dtype is pinned to the STORED key dtype;
* work per batch ∝ batch + collisions, never corpus x batch.

Reference analog: the reference applies each change batch against
persisted incremental state before accepting it
(src/reconciliation/incremental/state.py:112-164); here "state" is the
dedup index and "apply" includes the accept/reject decision.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class GatedIndexMixin:
    """Mount over a ``*IndexSink`` (which supplies ``_project``,
    ``_upsert_projected``, ``_stored_pk_types``, ``deleted_col``,
    ``target_dir``, ``spark``); list the mixin FIRST so its
    ``__call__`` overrides the plain index-maintenance one."""

    _GATE_NAME: str = "GatedIndexSink"  # PhaseRecorder key
    _GATE_LABEL: str = "dedup gate"  # writer-beacon label stem
    _SCORE_COL: str = "score"  # dup-log similarity column name
    _SCORE_BEST_ASC: bool = False  # True when smaller score = closer

    # set by the concrete gate's __init__
    dups_dir: str

    # -- family hooks ---------------------------------------------------

    def _gate_surface(self, live: DataFrame) -> dict:
        """Family probe frames derived from the checkpointed projection
        of the batch's LIVE (non-deleted) rows."""
        raise NotImplementedError

    def _gate_cross_pairs(
        self, surface: dict, blocks: list
    ) -> DataFrame | None:
        """(a=batch id, b=indexed id, <score>) of the batch against the
        standing index, already thresholded, persisted + materialized
        (appended to ``blocks``); None when there is no index yet."""
        raise NotImplementedError

    def _gate_batch_pairs(
        self, surface: dict, reject_docs: DataFrame | None, blocks: list
    ) -> DataFrame:
        """(a, b, <score>) pairs within the batch remainder (minus
        ``reject_docs`` when given), ``a < b``, already thresholded,
        persisted + materialized (appended to ``blocks``)."""
        raise NotImplementedError

    # -- dup log ---------------------------------------------------------

    def _dup_batch_dir(self, batch_id: int) -> str:
        return os.path.join(self.dups_dir, f"batch_{int(batch_id)}")

    def dup_log(self) -> DataFrame | None:
        """Every rejected doc with what it duplicated: (doc, dup_of,
        <score>, kind, __batch_id) — the compacted generation plus
        every per-batch generation above the compaction watermark."""
        from sqlserver_pg_cdc_spark.streaming.batchlog import read_batch_log

        return read_batch_log(self.spark, self.dups_dir)

    def compact_dup_log(self, watermark_batch_id: int) -> dict:
        """Day-2 retention: fold closed ``batch_<id>`` generations at
        or below the watermark into one compacted generation (one dir
        per micro-batch otherwise grows forever). Pass a batch id the
        stream can no longer replay at or below; replays ABOVE it keep
        their exactly-once overwrite property. Run quiesced — enforced
        by the maintenance lock (see `streaming/batchlog.py`)."""
        from sqlserver_pg_cdc_spark.streaming.batchlog import (
            compact_batch_log,
        )

        return compact_batch_log(
            self.spark, self.dups_dir, watermark_batch_id
        )

    # -- the shared gate body ---------------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.streaming.lock import writer_beacon

        # two-way single-writer enforcement before any probe work: fail
        # fast while a compaction/maintenance pass runs, and hold
        # beacons on BOTH dirs for the batch's whole duration so a pass
        # cannot start mid-batch either
        with writer_beacon(
            self.dups_dir, f"{self._GATE_LABEL} batch (dup log)"
        ), writer_beacon(self.target_dir, f"{self._GATE_LABEL} batch"):
            self._gated_call(batch_df, batch_id)

    def _gated_call(self, batch_df: DataFrame, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.operators.dedup import dup_components
        from sqlserver_pg_cdc_spark.streaming import phases as _phases

        rec = _phases.PhaseRecorder()
        # ONE projection per batch — the family's signature/decode work
        # runs once, then the probe, the within-batch clustering, and
        # the index upsert all read from it. localCheckpoint, not
        # persist: it truncates the lineage, so the ~6 downstream
        # actions plan over a LogicalRDD instead of re-canonicalizing
        # the projection tree each time (~0.5 s of driver CPU per
        # action at ANY data size); blocks are batch-sized and a
        # Structured Streaming replay re-drives the whole batch anyway.
        # LAZY: the projection (the family's signature/decode pass —
        # the dominant per-batch compute) materializes inside the first
        # probe/cluster action instead of paying a dedicated eager job;
        # partitions a partial first action misses are checkpointed by
        # the fill-in pass Spark runs at that job's end, so every later
        # action still reads blocks only — one batch materialization
        # either way, one fewer scheduled job per batch ("projection"
        # phase time now rides inside "probe")
        proj = self._project(batch_df, batch_id).localCheckpoint(
            eager=False
        )
        rec.mark("projection")
        blocks: list[DataFrame] = []
        sc = self._SCORE_COL
        try:
            passthrough = None
            live = proj
            if self.deleted_col:
                passthrough = proj.filter(F.col("__del"))
                live = proj.filter(~F.col("__del"))
            surface = self._gate_surface(live)
            # 1) cross-corpus rejects: best match per doc (closest
            # score, tie -> smallest indexed id) — deterministic
            # dup_of. row_number, not a negated-id max_by: id_col is
            # caller-chosen and may be a string — unary minus would
            # cast it to double (NULL or a raise under ANSI). The
            # window shuffles on `a`, the same partitioning the probe's
            # distinct already produced.
            cross = self._gate_cross_pairs(surface, blocks)
            rec.mark("probe")
            dup_frames = []
            if cross is not None:
                order = (
                    F.col(sc).asc()
                    if self._SCORE_BEST_ASC
                    else F.col(sc).desc()
                )
                w = Window.partitionBy("a").orderBy(order, F.col("b").asc())
                best = (
                    cross.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                )
                dup_frames.append(
                    best.select(
                        F.col("a").alias("doc"),
                        F.col("b").alias("dup_of"),
                        sc,
                        F.lit("corpus").alias("kind"),
                    )
                )
            corpus_dup_docs = (
                dup_frames[0].select("doc") if dup_frames else None
            )
            remaining = live
            if corpus_dup_docs is not None:
                remaining = live.join(corpus_dup_docs, "doc", "left_anti")
            # 2) within-batch rejects: family candidates + exact verify
            # off the SHARED surface, connected components, keep each
            # cluster's minimum id
            pairs = self._gate_batch_pairs(surface, corpus_dup_docs, blocks)
            comps = dup_components(pairs)
            rec.mark("cluster")
            losers = comps.filter(~F.col("keep")).select(
                F.col("doc"), F.col("component").alias("dup_of")
            )
            pj = pairs.select(
                F.col("a").alias("doc"), F.col("b").alias("__pb"), sc
            ).unionByName(
                pairs.select(
                    F.col("b").alias("doc"), F.col("a").alias("__pb"), sc
                )
            )
            batch_dups = (
                losers.join(
                    pj,
                    (losers["doc"] == pj["doc"])
                    & (losers["dup_of"] == pj["__pb"]),
                    "left",
                )
                .select(
                    losers.doc, losers.dup_of,
                    F.col(sc),  # NULL when linked transitively
                    F.lit("batch").alias("kind"),
                )
            )
            dup_frames.append(batch_dups)
            dups = dup_frames[0]
            for f in dup_frames[1:]:
                dups = dups.unionByName(f)
            # pin the log's id dtype to the STORED key dtype (a batch
            # whose id arrives narrower must not fork the log schema)
            t = (self._stored_pk_types() or {}).get("doc")
            if t:
                dups = dups.withColumn(
                    "doc", F.col("doc").cast(t)
                ).withColumn("dup_of", F.col("dup_of").cast(t))
            (
                dups.withColumn("__batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .parquet(self._dup_batch_dir(batch_id))
            )
            rec.mark("log")
            # 3) index the survivors (rows are already in the stored
            # shape — no re-projection; un-probeable rows survive by
            # construction; CDC deletes bypass)
            survivors = remaining.join(
                losers.select("doc"), "doc", "left_anti"
            )
            if passthrough is not None:
                survivors = survivors.unionByName(passthrough)
            self._upsert_projected(survivors, batch_id)
            rec.mark("upsert")
        finally:
            _phases.record(self._GATE_NAME, rec.ph)
            # unpersist EVERY persisted block even when the batch fails
            # mid-gate (e.g. a DLQ'd write) — otherwise the blocks leak
            # in executor storage (r8 ADVICE)
            for blk in blocks:
                if blk is not None:
                    blk.unpersist()
            # proj is localCheckpoint'd: its batch-sized blocks are
            # reclaimed by the ContextCleaner once the frame drops out
            # of scope (unpersist() would be a no-op on checkpoint RDDs)
            del proj
