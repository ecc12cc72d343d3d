"""SCD Type-2 history apply: CDC changes as versioned dimension history.

The upsert sink (`streaming/apply.py`) keeps ONE row per key — correct
for replication parity with the reference (PostgreSQL target), but a
warehouse consumer usually wants the history: every version of every
row with its validity interval.  This operator applies a CDC batch to a
history table in the classic slowly-changing-dimension-type-2 shape:

    (*business cols, __lsn, __valid_from_lsn, __valid_to_lsn, __active)

- a new version CLOSES the previous one (``__valid_to_lsn`` = the new
  version's LSN, ``__active`` = false) and appends itself open-ended;
- a delete closes the current version without appending (the key has no
  active row afterwards);
- within a batch, versions apply in LSN order (every intermediate
  version is preserved — not just the batch's last, which is what the
  upsert sink's latest-per-key dedup would keep);
- replays are idempotent: a version whose (key, LSN) already exists in
  the history is skipped before any interval surgery.

Scale: one groupBy/window per batch keyed on the PK over (history's
AFFECTED keys + batch) — the history is first semi-joined down to keys
present in the batch, so the rewrite touches O(changed keys × their
versions), not O(history).  The final merge is a union + window
recomputation of validity chains for affected keys only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OPEN_LSN = (1 << 62)  # sentinel for "still active"; larger than any real LSN


def scd2_apply(
    history: DataFrame | None,
    batch: DataFrame,
    pk_cols: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "d",
) -> DataFrame:
    """Apply one CDC batch to an SCD2 history frame and return the new
    history.  ``history`` of None means an empty history (bootstrap).

    ``batch`` carries the business columns plus ``lsn_col`` and
    ``op_col`` ('c'/'u'/'r' upserts, ``delete_op`` deletes).  Deletes
    are represented in the history as a tombstone version (NULL business
    columns are fine) that immediately closes — its only effect is
    closing the predecessor.
    """
    biz = [c for c in batch.columns if c not in (lsn_col, op_col)]
    versions = batch.select(
        *[F.col(c) for c in biz],
        F.col(lsn_col).cast("long").alias("__lsn"),
        (F.col(op_col) == delete_op).alias("__is_delete"),
    )
    if history is not None:
        # additive schema evolution (reference auto.evolve): a batch that
        # GAINED a column widens the history (old versions read NULL); a
        # batch LACKING a history column gets typed NULLs (old-shape
        # producer / upstream drop the sink keeps). Type changes raise —
        # the sink's error path DLQs the batch.
        from pyspark.sql import types as T

        from sqlserver_pg_cdc_spark.operators.evolution import diff_schemas

        meta_cols = {
            "__lsn", "__is_delete", "__valid_from_lsn",
            "__valid_to_lsn", "__active",
        }
        hist_biz = T.StructType(
            [f for f in history.schema.fields if f.name not in meta_cols]
        )
        batch_biz = T.StructType(
            [f for f in versions.schema.fields if f.name not in meta_cols]
        )
        d = diff_schemas(hist_biz, batch_biz)
        if d.type_changed:
            raise ValueError(
                f"incompatible schema change (type): {d.type_changed} — "
                "additive evolution only; route this batch to the DLQ"
            )
        for name, _ in d.added:
            history = history.withColumn(
                name, F.lit(None).cast(batch_biz[name].dataType)
            )
        for name, _ in d.removed:
            versions = versions.withColumn(
                name, F.lit(None).cast(hist_biz[name].dataType)
            )
        biz = [f.name for f in hist_biz.fields] + [n for n, _ in d.added]
    if history is not None:
        # NULL-SAFE key matching throughout: the window recomputation
        # below groups NULL keys into one partition (SQL semantics), so
        # the semi/anti split must too — with plain equality a NULL-key
        # chain would never be "affected", leaving two open versions
        # after a cross-batch update. <=> keys still hash-join.
        keys = versions.select(*pk_cols).distinct()

        def _key_cond(left, right):
            cond = None
            for c in pk_cols:
                term = left[c].eqNullSafe(right[c])
                cond = term if cond is None else (cond & term)
            return cond

        h = history.alias("__h")
        k = keys.alias("__k")
        affected = h.join(k, _key_cond(h, k), "left_semi")
        untouched = h.join(k, _key_cond(h, k), "left_anti")
        # idempotent replay: drop batch versions already in the history
        seen = affected.select(*pk_cols, "__lsn").alias("__s")
        v = versions.alias("__v")
        versions = v.join(
            seen,
            _key_cond(v, seen) & (v["__lsn"] == seen["__lsn"]),
            "left_anti",
        )
        merged = affected.select(
            *[F.col(c) for c in biz], "__lsn", F.col("__is_delete")
        ).unionByName(versions)
    else:
        untouched = None
        merged = versions
    # recompute validity chains for the affected keys: order versions by
    # LSN, each closes at the next version's LSN (or stays open)
    w = Window.partitionBy(*pk_cols).orderBy(F.col("__lsn").asc())
    next_lsn = F.lead("__lsn").over(w)
    rebuilt = merged.select(
        *[F.col(c) for c in biz],
        "__lsn",
        "__is_delete",
        F.col("__lsn").alias("__valid_from_lsn"),
        F.coalesce(next_lsn, F.lit(OPEN_LSN)).alias("__valid_to_lsn"),
    ).withColumn(
        "__active",
        (F.col("__valid_to_lsn") == OPEN_LSN) & ~F.col("__is_delete"),
    )
    if untouched is not None:
        rebuilt = rebuilt.unionByName(untouched)
    return rebuilt


def current_view(history: DataFrame) -> DataFrame:
    """The upsert-equivalent projection: the single active version per
    key (deleted keys absent)."""
    drop = ["__lsn", "__is_delete", "__valid_from_lsn", "__valid_to_lsn", "__active"]
    return history.filter(F.col("__active")).drop(*drop)


def as_of_lsn(history: DataFrame, lsn: int) -> DataFrame:
    """Time travel: the table as it stood at ``lsn`` (versions whose
    validity interval contains it, deletes excluded)."""
    drop = ["__lsn", "__is_delete", "__valid_from_lsn", "__valid_to_lsn", "__active"]
    return history.filter(
        (F.col("__valid_from_lsn") <= lsn)
        & (F.col("__valid_to_lsn") > lsn)
        & ~F.col("__is_delete")
    ).drop(*drop)


class Scd2ParquetSink:
    """foreachBatch sink maintaining an SCD2 history table in parquet —
    the versioned-history alternative to ParquetUpsertSink, sharing its
    crash-recoverable generation-swap discipline (composition, not
    inheritance: the apply step rewrites version chains, not rows).

    The batch frame must carry the business columns + (lsn, op) the
    unwrap stage produces. Replays are idempotent by (key, LSN), so
    checkpoint re-delivery converges.
    """

    def __init__(
        self,
        spark,
        history_dir: str,
        pk_cols: list[str],
        lsn_col: str = "lsn",
        op_col: str = "op",
    ):
        from sqlserver_pg_cdc_spark.streaming.apply import ParquetUpsertSink

        # reuse the swap/recover machinery via a private upsert sink
        self._store = ParquetUpsertSink(spark, history_dir, pk_cols)
        self.pk_cols = pk_cols
        self.lsn_col = lsn_col
        self.op_col = op_col

    def history(self):
        return self._store.read_target()

    def __call__(self, batch_df, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.tracing import get_tracer

        with get_tracer().span("scd2_apply_batch", batch_id=batch_id):
            new_hist = scd2_apply(
                self.history(), batch_df, self.pk_cols,
                lsn_col=self.lsn_col, op_col=self.op_col,
            )
            self._store._swap_in(new_hist, self._store.target_dir)

    def current(self):
        h = self.history()
        return None if h is None else current_view(h)


class PartitionedScd2Sink:
    """SCD2 history sink with HASH-PARTITIONED state — the 100 TB shape
    of the versioned-history target.

    ``Scd2ParquetSink`` reads and swaps the ENTIRE history every
    micro-batch: O(history) per batch against a table that grows without
    bound (every version of every row, forever) — the worst possible
    table to rewrite per batch. Here the history lives in
    ``n_partitions`` independent ``part_NNNNN/`` directories keyed by
    ``pmod(xxhash64(*pk), n_partitions)`` (the
    ``HashPartitionedStateMixin`` discipline the flat CDC target and the
    streamed ANN index already ride); a batch

    1. routes its rows by PK hash and collects the distinct partition
       ids it touches (bounded by ``n_partitions``, never by data),
    2. reads ONLY the touched partitions of prior history,
    3. runs :func:`scd2_apply` against that slice — the apply step
       already confines version-chain surgery to the batch's keys, and
       every key in the slice hashes back into a touched partition —
    4. rewrites ONLY those partitions (one hive-style ``partitionBy``
       job + one rename-swap per touched partition).

    Per-batch work is O(batch + touched partitions), not O(history).
    Replays converge without batch-id bookkeeping: ``scd2_apply`` drops
    batch versions whose (key, LSN) the stored history already holds, so
    a crash between two partition swaps re-drives into both the
    committed and uncommitted partitions harmlessly. Reference analog:
    incremental reconciliation state applied per change batch,
    src/reconciliation/incremental/state.py:112-164.
    """

    def __init__(
        self,
        spark,
        history_dir: str,
        pk_cols: list[str],
        lsn_col: str = "lsn",
        op_col: str = "op",
        dlq_dir: str | None = None,
        n_partitions: int = 32,
    ):
        from sqlserver_pg_cdc_spark.streaming.apply import (
            HashPartitionedStateMixin,
            ParquetUpsertSink,
        )

        # composition over a private partitioned store: the mixin
        # contributes layout guards, per-partition recovery, and the
        # one-job multi-partition swap; the SCD2 apply replaces the
        # upsert merge entirely.
        class _Store(HashPartitionedStateMixin, ParquetUpsertSink):
            pass

        if n_partitions < 1:
            raise ValueError("n_partitions must be >= 1")
        self._store = _Store(spark, history_dir, pk_cols, lsn_col, dlq_dir)
        self._store.n_partitions = n_partitions
        self.spark = spark
        self.pk_cols = pk_cols
        self.lsn_col = lsn_col
        self.op_col = op_col
        self.dlq_dir = dlq_dir
        self.n_partitions = n_partitions
        self.target_dir = history_dir

    def history(self) -> DataFrame | None:
        return self._store.read_target()

    def current(self) -> DataFrame | None:
        h = self.history()
        return None if h is None else current_view(h)

    def as_of(self, lsn: int) -> DataFrame | None:
        h = self.history()
        return None if h is None else as_of_lsn(h, lsn)

    def history_for_keys(self, key_rows: list) -> DataFrame | None:
        """Point lookup into the versioned history: opens only the
        partition directories the keys hash to (a key's full audit trail
        lives in one partition by construction)."""
        return self._store.read_keys(key_rows)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.tracing import get_tracer

        try:
            with get_tracer().span(
                "scd2_apply_batch_partitioned",
                batch_id=batch_id,
                target=self.target_dir,
            ):
                self._apply(batch_df)
        except Exception as e:
            if self.dlq_dir is None:
                raise
            (
                batch_df.withColumn("__error_class", F.lit(type(e).__name__))
                .withColumn("__error_message", F.lit(str(e)[:2000]))
                .withColumn("__batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(self.dlq_dir)
            )

    def _apply(self, batch_df: DataFrame) -> None:
        from sqlserver_pg_cdc_spark.streaming.lock import writer_beacon

        # two-way single-writer enforcement: fail fast while
        # prune_history (or any pass) holds the lock, and hold a writer
        # beacon so a pass cannot start mid-batch either
        with writer_beacon(self.target_dir, "SCD2 apply batch"):
            self._apply_guarded(batch_df)

    def _apply_guarded(self, batch_df: DataFrame) -> None:
        import os

        st = self._store
        # hash the STORED key dtypes (xxhash64 is type-sensitive): a
        # batch whose key column arrives as int32 against a long-keyed
        # history (or vice versa) must route identically to prior writes
        routed = (
            st._cast_keys_to_stored(batch_df)
            .withColumn("__p", st._part_expr())
            .persist()
        )
        try:
            touched = sorted(
                r["__p"] for r in routed.select("__p").distinct().collect()
            )
            if not touched:
                return
            os.makedirs(self.target_dir, exist_ok=True)
            st._check_layout(create=True)
            st._sweep_batchtmps()
            prev_parts: list[int] = []
            for p in touched:
                pdir = st._part_dir(p)
                st._recover_part(pdir)
                if os.path.exists(pdir):
                    prev_parts.append(p)
            prev = None
            if prev_parts:
                prev = st._read_parts(prev_parts)  # mergeSchema: evolved
            new_slice = scd2_apply(
                prev,
                routed.drop("__p"),
                self.pk_cols,
                lsn_col=self.lsn_col,
                op_col=self.op_col,
            )
            st._stamp_schema(new_slice)
            st._swap_parts(new_slice.withColumn("__p", st._part_expr()), touched)
        finally:
            routed.unpersist()

    # -- day-2 maintenance ---------------------------------------------------

    def prune_history(self, watermark_lsn: int) -> dict:
        """History retention: physically drop versions whose validity
        interval ended at or before ``watermark_lsn``.

        An SCD2 history grows without bound by design — every version of
        every row, forever. Past the audit/compliance horizon the closed
        versions are dead weight; this drops exactly the rows no
        retained query can see: ``as_of(lsn)`` filters
        ``__valid_to_lsn > lsn``, so every time travel at or above the
        watermark is PROVABLY unchanged (time travel below it is
        forfeited — that is what retention means). Active versions and
        versions still open past the watermark (including delete
        markers, whose (key, LSN) presence keeps replays idempotent) are
        untouched. The reference bounds the same liability with change-
        event retention (docs/development-architecture.md:226).

        One O(history) pass; rewrites only partitions that held prunable
        versions (generation swap each). Returns
        ``{"pruned": n, "partitions_rewritten": k}``.

        Concurrency: run on a QUIESCED history (no concurrent apply
        batches), like :meth:`rescale` — the stats pass and the rewrite
        pass re-read the partition files, so a concurrent writer
        swapping a partition between the passes would be silently
        overwritten with this op's stale snapshot. Single writer only —
        ENFORCED since round 10 via the ``__maintenance.lock`` sentinel
        (`streaming/lock.py`): concurrent applies fail fast; a crashed
        pass leaves a lock that reads stale by pid/timestamp."""
        from sqlserver_pg_cdc_spark.streaming.lock import maintenance_lock

        with maintenance_lock(self.target_dir, "prune_history"):
            return self._prune_history_locked(watermark_lsn)

    def _prune_history_locked(self, watermark_lsn: int) -> dict:
        st = self._store
        st._check_layout()
        h = st.read_target()
        if h is None:
            return {"pruned": 0, "partitions_rewritten": 0}
        dead = F.coalesce(
            F.col("__valid_to_lsn") <= F.lit(int(watermark_lsn)),
            F.lit(False),
        )
        # NOT cached/checkpointed: the frame is HISTORY-sized (pinning
        # it in executor storage is the liability this op shrinks) and
        # its plan is a plain parquet scan — the two passes re-read the
        # partition files; partition fates come from the SAME pre-swap
        # stats pass (post-swap the original files are gone)
        routed = h.withColumn("__p", st._part_expr()).withColumn(
            "__dead", dead
        )
        stats = (
            routed.groupBy("__p")
            .agg(
                F.sum(F.col("__dead").cast("long")).alias("__dead_n"),
                F.count(F.lit(1)).alias("__tot"),
            )
            .collect()
        )
        hit = sorted(r["__p"] for r in stats if r["__dead_n"] > 0)
        if not hit:
            return {"pruned": 0, "partitions_rewritten": 0}
        pruned = sum(r["__dead_n"] for r in stats)
        emptied = {
            r["__p"]
            for r in stats
            if r["__dead_n"] > 0 and r["__tot"] == r["__dead_n"]
        }
        keep = routed.filter(F.col("__p").isin(hit) & ~F.col("__dead")).drop(
            "__dead"
        )
        st._swap_parts(keep, sorted(hit))
        for p in emptied:
            pdir = st._part_dir(p)
            if os.path.isdir(pdir):
                import shutil

                shutil.rmtree(pdir, ignore_errors=True)
        return {"pruned": pruned, "partitions_rewritten": len(hit)}

    def rescale(self, n_new: int) -> None:
        """Re-hash the history into ``n_new`` partitions (the
        HashPartitionedStateMixin maintenance op — a key's full version
        chain moves as a unit because every version hashes on the same
        PK). Run on a quiesced stream."""
        self._store.rescale(n_new)
        self.n_partitions = n_new
