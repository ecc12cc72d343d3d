"""Streaming continuous aggregates: a foreachBatch sink maintaining a
materialized rollup from the change stream.

Each micro-batch contributes its aggregate STATE (count/sum/min/max per
group — `operators/continuous_agg.py`) and the sink merges it into the
persisted state table.  Unlike the upsert sink's O(table) rewrite, the
rewrite here is STATE-sized (groups, not rows) — the correct
incremental-view-maintenance shape at any scale: per batch, one delta
aggregation over the batch + one merge shuffle over state-sized frames.

Reuses the crash-recoverable generation-swap discipline of
`ParquetUpsertSink` (write-to-tmp, two-rename swap, __old_* recovery),
so a batch re-driven after a crash converges.  NOTE replayed batches
are NOT idempotent for additive states (a re-merged batch double
counts) — run under Spark checkpointing, which re-delivers each batch
id at most once after the sink committed, or stamp batch ids into the
state and skip already-merged ones (``idempotent=True`` does this with
one extra max-batch-id column).
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.continuous_agg import (
    build_state,
    finalize,
    merge_states,
)
from sqlserver_pg_cdc_spark.streaming.apply import ParquetUpsertSink


class ContinuousAggSink(ParquetUpsertSink):
    """foreachBatch callable: ``writeStream.foreachBatch(sink)``.

    NOTE this base sink reads+rewrites the WHOLE state table per batch
    — fine for bounded group keys (daily buckets, event types); for
    high-cardinality keys use :class:`PartitionedContinuousAggSink`,
    which touches only the hash partitions the batch hits.

    ``project`` (optional) maps the raw batch frame to (keys..., value)
    — e.g. unwrap a CDC envelope, derive the day bucket.  With
    ``idempotent=True`` the state carries the last merged batch id and
    silently skips re-delivered batches (exactly-once merge on top of
    at-least-once redelivery)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key_cols: list[str],
        value_col: str,
        project: Callable[[DataFrame], DataFrame] | None = None,
        idempotent: bool = False,
        dlq_dir: str | None = None,
    ):
        super().__init__(spark, state_dir, key_cols, dlq_dir=dlq_dir)
        self.value_col = value_col
        self.project = project
        self.idempotent = idempotent

    def _apply(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        proj = self.project(batch_df) if self.project else batch_df
        delta = build_state(proj, self.pk_cols, self.value_col)
        if self.idempotent:
            delta = delta.withColumn("__bid", F.lit(int(batch_id or 0)))
        prev = self.read_target()
        if prev is None:
            merged = delta
        else:
            if self.idempotent:
                done = prev.agg(F.max("__bid")).collect()[0][0]
                if done is not None and batch_id is not None and batch_id <= done:
                    return  # replayed batch: already merged
                merged = merge_states(
                    [prev.drop("__bid"), delta.drop("__bid")], self.pk_cols
                ).withColumn("__bid", F.lit(int(batch_id or 0)))
            else:
                merged = merge_states([prev, delta], self.pk_cols)
        self._swap_in(merged, self.target_dir)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.tracing import get_tracer

        try:
            with get_tracer().span(
                "rollup_merge_batch", batch_id=batch_id, target=self.target_dir
            ):
                self._apply(batch_df, batch_id)
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

    def result(self) -> DataFrame | None:
        """The finalized materialized aggregate (None before any batch)."""
        st = self.read_target()
        if st is None:
            return None
        if self.idempotent and "__bid" in st.columns:
            st = st.drop("__bid")
        return finalize(st, self.pk_cols)


class CmsSink(ParquetUpsertSink):
    """foreachBatch sink maintaining a count-min sketch
    (`operators/cms.py`) from a stream — heavy-hitter frequency state
    that NEVER grows: the merged state is at most d*w cells (4096 by
    default) regardless of stream cardinality, so unlike the rollup
    sinks there is nothing to partition — the per-batch rewrite is a
    few KB by construction. The sketch merge is a cell-wise sum
    (associative + commutative), so any batch split of the stream
    produces the identical sketch; ``estimate`` answers point queries
    against the current state with the broadcast min-over-cells plan.

    ``project`` (optional) maps the raw batch frame to one ITEM
    OCCURRENCE per row (e.g. unwrap an envelope, explode tokens)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        item_col: str,
        project: Callable[[DataFrame], DataFrame] | None = None,
        d: int = 4,
        w: int = 1024,
        dlq_dir: str | None = None,
    ):
        super().__init__(spark, state_dir, [item_col], dlq_dir=dlq_dir)
        self.item_col = item_col
        self.project = project
        self.d = d
        self.w = w

    def _apply(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        from sqlserver_pg_cdc_spark.operators.cms import cms_build, cms_merge

        proj = self.project(batch_df) if self.project else batch_df
        delta = cms_build(proj, self.item_col, self.d, self.w)
        prev = self.read_target()
        merged = delta if prev is None else cms_merge([prev, delta])
        self._swap_in(merged, self.target_dir)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.tracing import get_tracer

        try:
            with get_tracer().span(
                "cms_merge_batch", batch_id=batch_id, target=self.target_dir
            ):
                self._apply(batch_df, batch_id)
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

    def estimate(self, items: DataFrame, est_col: str = "cms_est") -> DataFrame | None:
        """Point-query estimates for a candidate frame against the
        current sketch state (None before any batch)."""
        from sqlserver_pg_cdc_spark.operators.cms import cms_estimate

        sketch = self.read_target()
        if sketch is None:
            return None
        return cms_estimate(
            items, sketch, self.item_col, self.d, self.w, est_col=est_col
        )


class PartitionedContinuousAggSink(ContinuousAggSink):
    """Continuous-agg sink with HASH-PARTITIONED state: the 100 TB shape.

    ``ContinuousAggSink`` reads, merges, and swaps the WHOLE state table
    every micro-batch — O(state) per batch, which with a
    high-cardinality group key (per-user rollups: 10^8 groups) turns a
    10-row batch into a full-table rewrite.  Here the state lives in
    ``n_partitions`` independent subdirectories keyed by
    ``pmod(xxhash64(*keys), n_partitions)``; a batch

    1. aggregates its delta (batch-sized),
    2. collects the distinct partition ids it touches (bounded by
       ``n_partitions``, never by data),
    3. reads ONLY the touched partitions of prior state,
    4. merges and rewrites ONLY those partitions (one job, hive-style
       ``partitionBy`` write, then one rename-swap per touched
       partition).

    Untouched partition files are never opened, rewritten, or renamed —
    per-batch work is O(delta + touched state), the same
    partition-pruned discipline Delta/Iceberg MERGE gives on a
    clustered table.  Each partition directory keeps the parent's
    crash-recoverable generation-swap (write-tmp, rename old, rename
    new, per-partition __old recovery), and with ``idempotent=True``
    the replay guard is PER PARTITION (each partition's state carries
    the last batch id merged into it), so a crash between two partition
    swaps re-drives the batch without double counting the partitions
    that already committed.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key_cols: list[str],
        value_col: str,
        project: Callable[[DataFrame], DataFrame] | None = None,
        idempotent: bool = False,
        dlq_dir: str | None = None,
        n_partitions: int = 32,
    ):
        super().__init__(
            spark, state_dir, key_cols, value_col,
            project=project, idempotent=idempotent, dlq_dir=dlq_dir,
        )
        if n_partitions < 1:
            raise ValueError("n_partitions must be >= 1")
        self.n_partitions = n_partitions

    # -- partition plumbing -------------------------------------------------

    def _part_expr(self):
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in self.pk_cols]),
            F.lit(self.n_partitions),
        ).cast("int")

    def _part_dir(self, p: int) -> str:
        return os.path.join(self.target_dir, f"part_{p:05d}")

    def _recover_part(self, pdir: str) -> None:
        """Per-partition crash recovery: a crash between the two swap
        renames leaves the newest __old_* generation as the pre-batch
        partition — restore it (same discipline as the parent's
        _recover, scoped to one partition directory)."""
        if os.path.exists(pdir):
            return
        olds = self._generations("old", pdir)
        if olds:
            os.rename(olds[-1], pdir)

    def _existing_parts(self) -> list[int]:
        import glob as _glob

        out = []
        for d in _glob.glob(os.path.join(self.target_dir, "part_[0-9]*")):
            base = os.path.basename(d)
            if "__" in base:  # tmp/old generation, not a live partition
                continue
            out.append(int(base.split("_", 1)[1]))
        return sorted(out)

    # -- batch apply --------------------------------------------------------

    def _apply(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        proj = self.project(batch_df) if self.project else batch_df
        delta = (
            build_state(proj, self.pk_cols, self.value_col)
            .withColumn("__p", self._part_expr())
            .persist()
        )
        try:
            touched = sorted(
                r["__p"] for r in delta.select("__p").distinct().collect()
            )
            if not touched:
                return
            os.makedirs(self.target_dir, exist_ok=True)
            prev_parts: list[int] = []
            for p in touched:
                pdir = self._part_dir(p)
                self._recover_part(pdir)
                if os.path.exists(pdir):
                    prev_parts.append(p)
            prev = None
            if prev_parts:
                prev = self.spark.read.parquet(
                    *[self._part_dir(p) for p in prev_parts]
                ).withColumn("__p", self._part_expr())
            skip: set[int] = set()
            if self.idempotent and prev is not None and batch_id is not None:
                # per-partition replay guard: __bid is constant within a
                # partition generation; a partition whose stored id is
                # >= this batch already merged it (crash mid-swap)
                done = {
                    r["__p"]: r["b"]
                    for r in prev.groupBy("__p").agg(F.max("__bid").alias("b")).collect()
                }
                skip = {p for p, b in done.items() if b is not None and batch_id <= b}
                if skip:
                    delta_live = delta.filter(~F.col("__p").isin([int(s) for s in skip]))
                    prev = prev.filter(~F.col("__p").isin([int(s) for s in skip]))
                else:
                    delta_live = delta
                prev = prev.drop("__bid")
            else:
                delta_live = delta
            live_touched = [p for p in touched if p not in skip]
            if not live_touched:
                return
            states = [delta_live.drop("__p")]
            if prev is not None:
                states.append(prev.drop("__p"))
            merged = merge_states(states, self.pk_cols).withColumn(
                "__p", self._part_expr()
            )
            if self.idempotent:
                merged = merged.withColumn("__bid", F.lit(int(batch_id or 0)))
            # ONE job writes every touched partition hive-style; the
            # per-partition swap below is pure renames
            tmp = os.path.join(
                self.target_dir, f"__batchtmp_{uuid.uuid4().hex[:8]}"
            )
            merged.write.mode("overwrite").partitionBy("__p").parquet(tmp)
            try:
                for p in live_touched:
                    src = os.path.join(tmp, f"__p={p}")
                    if not os.path.isdir(src):
                        continue  # delta had only retractions merging to nothing
                    pdir = self._part_dir(p)
                    if os.path.exists(pdir):
                        os.rename(pdir, f"{pdir}__old_{uuid.uuid4().hex[:8]}")
                    os.rename(src, pdir)
                    for stale in self._generations("old", pdir) + self._generations(
                        "tmp", pdir
                    ):
                        shutil.rmtree(stale, ignore_errors=True)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        finally:
            delta.unpersist()

    def read_target(self) -> DataFrame | None:
        if not os.path.isdir(self.target_dir):
            return None
        for p in range(self.n_partitions):
            self._recover_part(self._part_dir(p))
        parts = self._existing_parts()
        if not parts:
            return None
        return self.spark.read.parquet(*[self._part_dir(p) for p in parts])

    def result(self) -> DataFrame | None:
        st = self.read_target()
        if st is None:
            return None
        if self.idempotent and "__bid" in st.columns:
            st = st.drop("__bid")
        return finalize(st, self.pk_cols)
