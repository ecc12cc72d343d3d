"""Stream-stream joins (event-time interval joins).

The reference's CDC plane never joins two live streams, but a Spark
engine gets stream-stream joins natively and real pipelines need them
(click->purchase attribution, request->response matching, change->audit
correlation). The one non-obvious part is state hygiene: an unbounded
stream-stream join keeps EVERY row in state forever. Bounding it needs
(a) watermarks on both inputs and (b) an event-time range condition in
the join, so Spark can evict left rows once the right watermark passes
``left_ts + upper`` (and vice versa).

The same code path works on batch frames (watermarks skipped, the range
condition is just a predicate) — which is also how the oracle checks it:
the batch run IS the relational semantics, and the streaming drain must
reproduce it exactly for on-time data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.streaming.windows import _watermarkable


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 1 HOUR",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` to rows of ``left`` with matching keys and
    ``right_ts`` in ``[left_ts + lower, left_ts + upper]``.

    On streaming inputs both sides get a watermark and the range
    condition bounds the join state (Spark evicts rows the other side's
    watermark can no longer match). Column names are disambiguated with
    ``l_``/``r_`` prefixes on the timestamp columns; key columns appear
    once.

    100-TB posture: the join shuffles both sides on the key columns
    only; state per key is O(rows within the interval window), not
    O(stream). Outer variants emit nulls only after the watermark
    closes the window (Spark semantics).
    """
    l = left
    r = right
    if left.isStreaming:
        l = _watermarkable(left, left_ts).withWatermark(left_ts, watermark)
    if right.isStreaming:
        r = _watermarkable(right, right_ts).withWatermark(right_ts, watermark)
    lp = l.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("l_ts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in l.columns
            if c not in on and c != left_ts
        ],
    )
    rp = r.select(
        *[F.col(k).alias(f"__r_{k}") for k in on],
        F.col(right_ts).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in r.columns
            if c not in on and c != right_ts
        ],
    )
    cond: Column = F.lit(True)
    for k in on:
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    cond = (
        cond
        & (F.col("r_ts") >= F.expr(f"l_ts + {lower}"))
        & (F.col("r_ts") <= F.expr(f"l_ts + {upper}"))
    )
    return lp.join(rp, cond, how).drop(*[f"__r_{k}" for k in on])


def attribution_join(
    events: DataFrame,
    trigger_type: str = "click",
    outcome_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "INTERVAL 1 HOUR",
    watermark: str = "2 hours",
) -> DataFrame:
    """Attribute outcome events to every trigger event of the same key
    within the horizon after the trigger (click->purchase attribution).

    Works identically over a batch events table or a readStream of it;
    one shuffle on the key for both sides.
    """
    trig = events.filter(F.col("event_type") == trigger_type).select(
        key_col, ts_col, F.col("event_id").alias("trigger_id")
    )
    outc = events.filter(F.col("event_type") == outcome_type).select(
        key_col,
        ts_col,
        F.col("event_id").alias("outcome_id"),
        F.col("value").alias("outcome_value"),
    )
    return interval_join(
        trig,
        outc,
        on=[key_col],
        left_ts=ts_col,
        right_ts=ts_col,
        lower="INTERVAL 0 SECONDS",
        upper=horizon,
        watermark=watermark,
    ).select(
        key_col,
        F.col("l_trigger_id").alias("trigger_id"),
        F.col("l_ts").alias("trigger_ts"),
        F.col("r_outcome_id").alias("outcome_id"),
        F.col("r_ts").alias("outcome_ts"),
        F.col("r_outcome_value").alias("outcome_value"),
    )
