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
    _SCORE_TYPE: str = "double"  # dup-log similarity dtype (DDL)

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

    def _gate_quotient(self, surface: dict) -> tuple | None:
        """OPTIONAL duplicate-group quotient for the within-batch
        clustering: ``(qf, key_cols)`` where ``qf`` is one
        ``(doc, *key_cols)`` row per probe-able live doc and two docs
        with EQUAL keys are guaranteed the same family score as each
        key with itself (the key IS the scored payload — shingle set /
        vector / fingerprint). Docs absent from ``qf`` bypass the
        quotient (they are also absent from the band frames, so they
        can never pair). None (the default) keeps the direct
        all-members pair path.

        Why: on a duplicate-heavy batch (the crawl-ingest norm) the
        banded self-join emits |group|^2 candidate pairs per identical
        group — the same explosion the round-12 video queries removed
        by pairing one representative per distinct fingerprint. The
        quotient is component-exact (equal keys share ALL band keys and
        their mutual score equals the key's self-score, so when the
        self-score passes the threshold an equal-key pair is always an
        edge; when it fails — a zero vector, a sub-min_frames clip —
        equal-key docs never edge DIRECTLY in the un-quotiented graph
        either, and any indirect merge goes through a neighbor group
        both docs share identically)."""
        return None

    def _gate_self_score(self, reps: DataFrame) -> DataFrame:
        """(doc, <score>) of each quotient-group representative scored
        against ITSELF with the family's exact pair expression,
        FILTERED to rows that pass the family threshold — i.e. the
        groups whose members mutually edge. Must compute through the
        same expressions the pair path uses (a shortcut constant like
        1.0 can diverge from the float the oracle mirrors). Only called
        when ``_gate_quotient`` returns non-None."""
        raise NotImplementedError

    # -- dup log ---------------------------------------------------------

    def _dup_batch_dir(self, batch_id: int) -> str:
        return os.path.join(self.dups_dir, f"batch_{int(batch_id)}")

    def dup_log(self) -> DataFrame | None:
        """Every rejected doc with what it duplicated: (doc, dup_of,
        <score>, kind, __batch_id) — the compacted generation plus
        every per-batch generation above the compaction watermark.

        The template writes this FIXED five-column shape every batch
        with the id dtype pinned to the stored key dtype, so when the
        state's stamp answers the key type the read passes the full
        DDL explicitly — no footer-merge job per log open (guide §6);
        a stampless state (no batches yet, foreign log) falls back to
        the mergeSchema read."""
        from sqlserver_pg_cdc_spark.streaming.batchlog import read_batch_log

        t = (self._stored_pk_types() or {}).get("doc")
        schema = (
            f"doc {t}, dup_of {t}, {self._SCORE_COL} {self._SCORE_TYPE}, "
            "kind string, __batch_id int"
        ) if t else None
        return read_batch_log(self.spark, self.dups_dir, schema=schema)

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
        # phase time now rides inside "probe").
        # widen_small_batch: an under-parallelized batch (single scan
        # split) would otherwise run the whole projection — and seed
        # the checkpoint blocks every downstream tree reads — on ONE
        # task (guide §2.5); no-op for batches already at session
        # parallelism
        from sqlserver_pg_cdc_spark.streaming.apply import (
            widen_small_batch,
        )

        proj = self._project(
            widen_small_batch(batch_df), batch_id
        ).localCheckpoint(eager=False)
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
            # cluster's minimum id. When the family exposes a quotient
            # key, identical docs collapse to ONE representative (their
            # group minimum) before the banded self-join — the pair set
            # goes from |group|^2 to one row per distinct payload pair
            # (see _gate_quotient) — and every decision is expanded
            # back through the groups, provably unchanged.
            qt = self._gate_quotient(surface)
            member = None
            if qt is not None:
                qf, kcols = qt
                rem_q = qf
                if corpus_dup_docs is not None:
                    rem_q = qf.join(corpus_dup_docs, "doc", "left_anti")
                # group minimum WITHIN the remainder — identical to the
                # component minimum the direct path elects when the
                # group's self-edge passes
                wq = Window.partitionBy(*kcols)
                member = (
                    rem_q.withColumn("__rep", F.min("doc").over(wq))
                    .withColumn("__n", F.count(F.lit(1)).over(wq))
                    .persist()
                )
                blocks.append(member)
                # self-score ONLY for groups of >= 2: a singleton keeps
                # itself whether or not its self-edge passes, and the
                # direct path never evaluates a score expression for a
                # candidate-less doc — a degenerate payload whose score
                # expression cannot be evaluated (an ANSI 0/0 on a
                # zero-norm vector) must not start failing as a
                # singleton when it never paired with anything
                selfsc = self._gate_self_score(
                    member.filter(
                        (F.col("doc") == F.col("__rep"))
                        & (F.col("__n") >= 2)
                    )
                ).select(F.col("doc").alias("__rep"), F.col(sc).alias("__self"))
                nonreps = member.filter(
                    F.col("doc") != F.col("__rep")
                ).select("doc")
                rej2 = (
                    nonreps
                    if corpus_dup_docs is None
                    else corpus_dup_docs.unionByName(nonreps)
                )
                pairs = self._gate_batch_pairs(surface, rej2, blocks)
            else:
                pairs = self._gate_batch_pairs(
                    surface, corpus_dup_docs, blocks
                )
            comps = dup_components(pairs)
            rec.mark("cluster")
            pj = pairs.select(
                F.col("a").alias("doc"), F.col("b").alias("__pb"), sc
            ).unionByName(
                pairs.select(
                    F.col("b").alias("doc"), F.col("a").alias("__pb"), sc
                )
            )
            if member is None:
                losers = comps.filter(~F.col("keep")).select(
                    F.col("doc"), F.col("component").alias("dup_of")
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
            else:
                # expand rep-level components through the groups:
                # - rep clustered -> every member takes its component
                # - rep un-clustered, self-edge passes -> the group IS
                #   a component (min = rep), exactly the complete
                #   subgraph identical docs form on the direct path
                # - rep un-clustered, self-edge fails (zero vector,
                #   sub-min_frames clip) -> members are singletons,
                #   exactly the direct path's no-edge outcome
                repcomp = comps.select(
                    F.col("doc").alias("__rep"), "component"
                )
                expanded = (
                    member.select("doc", "__rep")
                    .join(repcomp, "__rep", "left")
                    .join(selfsc, "__rep", "left")
                    .select(
                        "doc", "__rep", "__self",
                        F.coalesce(
                            F.col("component"),
                            F.when(
                                F.col("__self").isNotNull(), F.col("__rep")
                            ).otherwise(F.col("doc")),
                        ).alias("component"),
                    )
                )
                losers = expanded.filter(
                    F.col("doc") != F.col("component")
                ).select(
                    "doc", F.col("component").alias("dup_of"),
                    "__rep", "__self",
                )
                # direct-pair score through the quotient: a member's
                # score against ITS OWN rep's group is the group's
                # self-score; against another group it is the rep
                # pair's score (band keys and the score are functions
                # of the quotient key alone) — NULL when transitive,
                # same as the direct path's missing pj row
                batch_dups = (
                    losers.join(
                        pj,
                        (losers["__rep"] == pj["doc"])
                        & (losers["dup_of"] == pj["__pb"]),
                        "left",
                    )
                    .select(
                        losers["doc"], losers["dup_of"],
                        F.when(
                            losers["__rep"] == losers["dup_of"],
                            losers["__self"],
                        ).otherwise(pj[sc]).alias(sc),
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
