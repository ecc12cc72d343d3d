"""Streaming windowed aggregation & custom stateful operators (St9).

The reference has no windowed aggregation (its CDC plane is pure
replication), but a Spark-native engine gets them almost for free and a
training-data pipeline needs them (rates, rolling quality metrics,
per-key session state). Provided:

- ``windowed_event_counts``: tumbling-window counts/sums with a watermark
  for late data — works identically over ``readStream`` or a batch frame
  (same code path, Catalyst handles both).
- ``sessionize``: session windows keyed by user with a gap timeout.
- ``running_totals_stateful``: applyInPandasWithState example — per-key
  running count/sum surviving across micro-batches via GroupState, the
  extension point for operators Spark lacks natively.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _watermarkable(events: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (with local tz); parquet/JSON fixtures
    carry tz-less timestamps that Spark 4 reads as TIMESTAMP_NTZ. The
    session pins timeZone=UTC (session.py), so the cast is value-identical
    and window boundaries match the batch/NTZ result exactly."""
    if isinstance(events.schema[ts_col].dataType, T.TimestampNTZType):
        return events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_len: str = "1 day",
    watermark: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts + decimal-exact value sums. On a streaming
    input the watermark bounds state and admits late rows up to the bound
    (late beyond it are dropped — for the CDC plane's never-drop
    semantics see apply.with_stale_flag instead)."""
    src = events
    if events.isStreaming:
        src = _watermarkable(events, ts_col).withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window_len).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_len: str = "1 day",
    slide: str = "6 hours",
    watermark: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding (hopping) window counts + decimal-exact value sums: every
    event lands in len/slide overlapping windows (Spark explodes them
    internally; state per window is bounded by the watermark on
    streams). Batch and stream share this exact code path."""
    src = events
    if events.isStreaming:
        src = _watermarkable(events, ts_col).withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window_len, slide).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based) per key."""
    src = (_watermarkable(events, ts_col).withWatermark(ts_col, watermark) if events.isStreaming else events)
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)


def running_totals_stateful(events: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count and value sum, carried across micro-batches.

    This is the pattern for semantics Spark's built-ins can't express
    (custom sketches, CDC conflict resolution, incremental models):
    Arrow-batched per-key groups + explicit GroupState.
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
