"""Streaming benchmark-decontamination gate: the eval/benchmark set is
ITSELF a change stream (new benchmarks registered, retired ones
deleted), and the training corpus is gated against its CURRENT state at
ingest time.

Two pieces:

- `EvalGramIndexSink` — a foreachBatch sink maintaining the eval-set
  k-gram index through the hash-partitioned LSN-guarded upsert
  (`PartitionedParquetUpsertSink`): one (doc, grams, lsn[, __del]) row
  per eval document, so an updated benchmark document atomically
  replaces its whole gram set and a deleted one drops out of the probe
  (soft delete under the LSN guard — a stale replay cannot resurrect
  it). Gram extraction parameters (k) are recorded in the state dir and
  guarded on reopen, the same discipline as the LSH/IVF/PQ/MinHash
  index sinks.
- `DecontamGate` — a foreachBatch callable gating a CORPUS stream:
  each micro-batch is scored against the live eval grams
  (`operators/decontam.decontaminate_against_grams` — ONE shuffle join
  on the gram, work ∝ batch grams + hits, never the standing corpus);
  contaminated docs land in a quarantine log, clean docs in the
  accepted output, each written as one overwrite-by-batch-id parquet
  generation — a Structured Streaming replay of a crashed batch
  rewrites its own generations, so both sides are exactly-once with no
  read-side dedup.

Reference analog: the reference applies each change batch against
persisted incremental state before accepting it
(src/reconciliation/incremental/state.py:112-164); here the state is
the eval-set gram index and "apply" is the accept/quarantine decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.streaming.apply import PartitionedParquetUpsertSink


class EvalGramIndexSink(PartitionedParquetUpsertSink):
    """foreachBatch callable maintaining the eval-set gram index.

    ``lsn_col`` orders updates to the same eval doc across batches;
    without it each row is stamped with its batch id. ``deleted_col``
    makes the sink CDC-complete: retired benchmark docs stay in state
    under the LSN guard but are excluded from ``grams()`` and the
    contamination probe."""

    _PARAMS_FILE = "__decontam_params.json"

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str,
        text_col: str,
        k: int = 8,
        lsn_col: str | None = None,
        dlq_dir: str | None = None,
        n_partitions: int = 32,
        deleted_col: str | None = None,
    ):
        super().__init__(
            spark, state_dir, ["doc"], lsn_col="lsn",
            dlq_dir=dlq_dir, n_partitions=n_partitions,
        )
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.src_lsn_col = lsn_col
        self.deleted_col = deleted_col

    def _params(self) -> dict:
        return {"k": self.k, "id_col": self.id_col, "text_col": self.text_col}

    def _check_params(self, create: bool = False) -> None:
        """State built with one gram width probed with another silently
        under- or over-flags — record k on first write, fail fast on
        mismatch at open."""
        import json
        import os

        if not os.path.isdir(self.target_dir):
            return
        pf = os.path.join(self.target_dir, self._PARAMS_FILE)
        mine = self._params()
        if os.path.exists(pf):
            with open(pf) as f:
                stored = json.load(f)
            if stored != mine:
                diff = {
                    kk: {"stored": stored.get(kk), "sink": v}
                    for kk, v in mine.items()
                    if stored.get(kk) != v
                }
                raise ValueError(
                    f"decontam state at {self.target_dir} was built with "
                    f"different parameters than this sink: {diff} — "
                    "probing it would compare mismatched gram widths; "
                    "open it with the recorded parameters or rebuild"
                )
            return
        if self._existing_parts():
            raise ValueError(
                f"decontam state at {self.target_dir} holds partitions "
                f"but no {self._PARAMS_FILE} — its gram width is unknown; "
                "rebuild the state"
            )
        if create:
            with open(pf, "w") as f:
                json.dump(mine, f)

    def _project(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        from sqlserver_pg_cdc_spark.functions.text import (
            shingles_from_tokens,
            tokens,
        )

        lsn = (
            F.col(self.src_lsn_col).cast("long")
            if self.src_lsn_col
            else F.lit(int(batch_id)).cast("long")
        )
        extra = [lsn.alias("lsn")]
        src = batch_df
        if self.deleted_col:
            del_flag = F.coalesce(
                F.col(self.deleted_col).cast("string") == F.lit("true"),
                F.lit(False),
            )
            src = batch_df.filter(F.col(self.text_col).isNotNull() | del_flag)
            extra.append(del_flag.alias("__del"))
        return src.select(
            F.col(self.id_col).alias("doc"),
            tokens(self.text_col).alias("__toks"),
            *extra,
        ).select(
            "doc",
            F.coalesce(
                F.array_distinct(shingles_from_tokens("__toks", self.k)),
                F.array().cast("array<string>"),
            ).alias("grams"),
            *[c for c in (["lsn", "__del"] if self.deleted_col else ["lsn"])],
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import os

        from sqlserver_pg_cdc_spark.streaming.apply import widen_small_batch

        os.makedirs(self.target_dir, exist_ok=True)
        self._check_params(create=True)
        # widen an under-parallelized batch before the shingle
        # projection (guide §2.5); no-op at session width
        super().__call__(
            self._project(widen_small_batch(batch_df), batch_id), batch_id
        )

    # -- query surface ------------------------------------------------------

    def _live_state(self) -> DataFrame | None:
        self._check_params()
        st = self.read_target()
        if st is None:
            return None
        if "__del" in st.columns:
            # NULL deleted-flag is live (matches CdcPipeline.active_rows)
            st = st.filter(~F.coalesce(F.col("__del"), F.lit(False)))
        return st

    def grams(self) -> DataFrame | None:
        """The distinct live eval grams ``(g)`` — what the contamination
        join probes. Retired (deleted) benchmark docs contribute
        nothing."""
        st = self._live_state()
        if st is None:
            return None
        return st.select(F.explode("grams").alias("g")).distinct()

    def contamination(
        self, corpus_df: DataFrame, min_hits: int = 1
    ) -> DataFrame | None:
        """Per-corpus-document contamination report against the CURRENT
        eval state — same shape as `operators/decontam.decontaminate`:
        (id, n_grams, n_eval_hits, contam_frac, contaminated). None
        when no eval state exists yet."""
        from sqlserver_pg_cdc_spark.operators.decontam import (
            decontaminate_against_grams,
        )

        g = self.grams()
        if g is None:
            return None
        return decontaminate_against_grams(
            corpus_df, g, self.id_col, self.text_col,
            k=self.k, min_hits=min_hits,
        )


class DecontamGate:
    """foreachBatch callable gating a corpus stream against an
    `EvalGramIndexSink`'s current state.

    Per batch: contaminated docs (>= ``min_hits`` eval-gram hits) are
    written to ``quarantine_dir/batch_<id>`` WITH their report columns
    (n_grams, n_eval_hits, contam_frac); clean docs to
    ``accepted_dir/batch_<id>``. Overwrite-by-batch-id keeps both sides
    exactly-once under replay. An empty eval index accepts everything
    (nothing to be contaminated BY) — the quarantine stays empty rather
    than the gate blocking ingest."""

    def __init__(
        self,
        eval_index: EvalGramIndexSink,
        accepted_dir: str,
        quarantine_dir: str,
        min_hits: int = 1,
    ):
        self.eval_index = eval_index
        self.accepted_dir = accepted_dir
        self.quarantine_dir = quarantine_dir
        self.min_hits = min_hits

    @property
    def spark(self) -> SparkSession:
        return self.eval_index.spark

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.streaming.lock import writer_beacon

        # two-way single-writer enforcement: a log compaction on either
        # side must not interleave with this batch's generation writes,
        # nor start mid-batch (the beacons hold for the whole batch)
        with writer_beacon(self.accepted_dir, "decontam gate batch"), \
                writer_beacon(self.quarantine_dir, "decontam gate batch"):
            self._gated_call(batch_df, batch_id)

    def _gated_call(self, batch_df: DataFrame, batch_id: int) -> None:
        import os

        from sqlserver_pg_cdc_spark.streaming.apply import widen_small_batch

        # an under-parallelized corpus batch would tokenize/shingle on
        # one task (guide §2.5); no-op at session width
        batch_df = widen_small_batch(batch_df)
        id_col = self.eval_index.id_col
        report = self.eval_index.contamination(batch_df, self.min_hits)
        if report is None:
            accepted = batch_df
            quarantined = None
        else:
            report = report.persist()
            try:
                bad = report.filter(F.col("contaminated"))
                quarantined = batch_df.join(
                    bad.select(
                        id_col, "n_grams", "n_eval_hits", "contam_frac"
                    ),
                    id_col,
                )
                accepted = batch_df.join(
                    bad.select(id_col), id_col, "left_anti"
                )
                os.makedirs(self.quarantine_dir, exist_ok=True)
                (
                    quarantined.withColumn("__batch_id", F.lit(int(batch_id)))
                    .write.mode("overwrite")
                    .parquet(os.path.join(
                        self.quarantine_dir, f"batch_{int(batch_id)}"
                    ))
                )
            finally:
                report.unpersist()
        os.makedirs(self.accepted_dir, exist_ok=True)
        (
            accepted.withColumn("__batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .parquet(os.path.join(self.accepted_dir, f"batch_{int(batch_id)}"))
        )

    def _read_gens(self, base: str) -> DataFrame | None:
        from sqlserver_pg_cdc_spark.streaming.batchlog import read_batch_log

        return read_batch_log(self.spark, base)

    def compact_logs(self, watermark_batch_id: int) -> dict:
        """Day-2 retention for BOTH gate logs: fold every closed
        ``batch_<id>`` generation at or below the watermark into one
        compacted generation per log (accepted grows one dir per
        micro-batch — the dominant growth — quarantine one per batch
        that caught anything). Same watermark contract as
        `DedupGateSink.compact_dup_log`; run quiesced."""
        from sqlserver_pg_cdc_spark.streaming.batchlog import (
            compact_batch_log,
        )

        return {
            "accepted": compact_batch_log(
                self.spark, self.accepted_dir, watermark_batch_id
            ),
            "quarantine": compact_batch_log(
                self.spark, self.quarantine_dir, watermark_batch_id
            ),
        }

    def accepted(self) -> DataFrame | None:
        return self._read_gens(self.accepted_dir)

    def quarantine_log(self) -> DataFrame | None:
        """Every quarantined doc with its contamination evidence:
        original columns + (n_grams, n_eval_hits, contam_frac,
        __batch_id)."""
        return self._read_gens(self.quarantine_dir)


class SemanticDecontamGate:
    """foreachBatch callable gating a corpus EMBEDDING stream against a
    live eval-set embedding index — the streaming shape of the batch
    ``semantic_decontam`` query (n-gram overlap misses paraphrases; this
    catches anything whose cosine to a live eval vector clears the
    threshold).

    Composition of existing pieces, per the gate discipline: the eval
    set is an `streaming/ann.AnnIndexSink` maintained from a CDC stream
    (registrations upsert, retirements ride soft deletes under the LSN
    guard — a retired benchmark stops contaminating, value-checked by
    the ``semantic_decontam_gate`` catalog oracle); each corpus batch is
    probed through ``eval_index.near_dups`` (banded hyperplane LSH
    candidates + exact-cosine verify on collisions only — work ∝ batch +
    collisions, never batch × eval). Contaminated docs land in
    ``quarantine_dir/batch_<id>`` WITH evidence (n_eval_hits,
    max_cosine), clean docs in ``accepted_dir/batch_<id>`` —
    overwrite-by-batch-id keeps both sides exactly-once under replay,
    and ``compact_logs`` applies the standard retention fold.

    The corpus stream must carry the same id/vector column names the
    eval index was built with (one CDC pipeline feeding both is the
    normal deployment). Rows with a NULL vector cannot be contaminated
    and pass straight to accepted. An empty eval index accepts
    everything — nothing to be contaminated BY.

    Reference analog: the reference applies each change batch against
    persisted incremental state before accepting it
    (src/reconciliation/incremental/state.py:112-164)."""

    def __init__(
        self,
        eval_index,
        accepted_dir: str,
        quarantine_dir: str,
        threshold: float = 0.9,
    ):
        self.eval_index = eval_index
        self.accepted_dir = accepted_dir
        self.quarantine_dir = quarantine_dir
        self.threshold = threshold

    @property
    def spark(self) -> SparkSession:
        return self.eval_index.spark

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.streaming.lock import writer_beacon

        # two-way single-writer enforcement before the probe work
        with writer_beacon(self.accepted_dir, "semantic gate batch"), \
                writer_beacon(self.quarantine_dir, "semantic gate batch"):
            self._gated_call(batch_df, batch_id)

    def _gated_call(self, batch_df: DataFrame, batch_id: int) -> None:
        import os

        from sqlserver_pg_cdc_spark.streaming import phases as _phases
        from sqlserver_pg_cdc_spark.streaming.apply import widen_small_batch

        rec = _phases.PhaseRecorder()
        # an under-parallelized corpus batch would compute its
        # hyperplane band bits on one task (guide §2.5); no-op at
        # session width
        batch_df = widen_small_batch(batch_df)
        id_col = self.eval_index.id_col
        pairs = self.eval_index.near_dups(batch_df, self.threshold)
        if pairs is None:
            accepted = batch_df
        else:
            report = (
                pairs.groupBy(F.col("a").alias(id_col))
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_eval_hits"),
                    F.max("cosine").alias("max_cosine"),
                )
                .persist()
            )
            try:
                quarantined = batch_df.join(report, id_col)
                accepted = batch_df.join(
                    report.select(id_col), id_col, "left_anti"
                )
                os.makedirs(self.quarantine_dir, exist_ok=True)
                (
                    quarantined.withColumn("__batch_id", F.lit(int(batch_id)))
                    .write.mode("overwrite")
                    .parquet(os.path.join(
                        self.quarantine_dir, f"batch_{int(batch_id)}"
                    ))
                )
                rec.mark("probe_quarantine")
                os.makedirs(self.accepted_dir, exist_ok=True)
                (
                    accepted.withColumn("__batch_id", F.lit(int(batch_id)))
                    .write.mode("overwrite")
                    .parquet(os.path.join(
                        self.accepted_dir, f"batch_{int(batch_id)}"
                    ))
                )
                rec.mark("accept")
            finally:
                report.unpersist()
                _phases.record("SemanticDecontamGate", rec.ph)
            return
        os.makedirs(self.accepted_dir, exist_ok=True)
        (
            accepted.withColumn("__batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .parquet(os.path.join(self.accepted_dir, f"batch_{int(batch_id)}"))
        )
        rec.mark("accept")
        _phases.record("SemanticDecontamGate", rec.ph)

    def _read_gens(self, base: str) -> DataFrame | None:
        from sqlserver_pg_cdc_spark.streaming.batchlog import read_batch_log

        return read_batch_log(self.spark, base)

    def accepted(self) -> DataFrame | None:
        return self._read_gens(self.accepted_dir)

    def quarantine_log(self) -> DataFrame | None:
        """Every quarantined doc with its evidence: original columns +
        (n_eval_hits, max_cosine, __batch_id)."""
        return self._read_gens(self.quarantine_dir)

    def compact_logs(self, watermark_batch_id: int) -> dict:
        """Same retention contract as `DecontamGate.compact_logs`."""
        from sqlserver_pg_cdc_spark.streaming.batchlog import (
            compact_batch_log,
        )

        return {
            "accepted": compact_batch_log(
                self.spark, self.accepted_dir, watermark_batch_id
            ),
            "quarantine": compact_batch_log(
                self.spark, self.quarantine_dir, watermark_batch_id
            ),
        }
