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
