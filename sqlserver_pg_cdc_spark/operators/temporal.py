"""Temporal joins — operators Spark's built-ins don't provide directly.

- ``as_of_join``: for each left row, the LATEST right row with
  right_ts <= left_ts per key (the time-series/point-in-time lookup).
  NOT implemented as an inequality join (which explodes to a per-key
  cross product): both sides union into one frame sorted by (key, ts)
  and a ``last(ignorenulls)`` window carries the most recent right
  payload forward — one shuffle on the key, linear work, no range
  explosion. At equal timestamps the right row is visible to the left
  row (<= semantics), arranged by a source-order tiebreak.
- ``range_join``: value-in-interval join. With a small interval side the
  plan is a broadcast + filter (fine); for big-big range joins,
  ``binned_range_join`` grids both sides on a bin width so candidates
  meet on an equi-join key first — turning O(n*m) into O(n + matches).

DuckDB has a native ASOF JOIN, which serves as the oracle for the
windowed implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
) -> DataFrame:
    """Left frame + the latest right payload as of each left timestamp.

    Right columns come back NULL when no right row precedes the left row.
    """
    rcols = right_value_cols or [
        c for c in right.columns if c not in key_cols and c != right_ts
    ]
    l_tagged = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            right.select(F.struct(*rcols).alias("s")).schema["s"].dataType
        ).alias("__rrow"),
    )
    # a right row with NULL timestamp can't be "as of" anything: DuckDB's
    # ASOF comparison rejects it (NULL >= ts is never true), but Spark's
    # ascending sort would place it FIRST and carry its payload — filter
    # it out so both engines agree
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__lrow"),
        F.struct(*[F.col(c) for c in rcols]).alias("__rrow"),
    )
    # right rows sort BEFORE left rows at equal ts -> <= visibility
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).withColumn(
        "__asof", F.last("__rrow", ignorenulls=True).over(w)
    )
    out_left = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"__asof.{c}").alias(c) for c in rcols]
    return merged.filter(F.col("__is_left") == 1).select(*out_left, *out_right)


def as_of_join_sql(
    left_sql: str,
    right_sql: str,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_value_cols: list[str],
) -> str:
    """DuckDB oracle using the native ASOF LEFT JOIN."""
    on = " AND ".join(f"l.{k} = r.{k}" for k in key_cols)
    lsel = ", ".join(f"l.{c}" for c in left_cols)
    rsel = ", ".join(f"r.{c}" for c in right_value_cols)
    return f"""
SELECT {lsel}, {rsel}
FROM ({left_sql}) l
ASOF LEFT JOIN ({right_sql}) r
  ON {on} AND l.{left_ts} >= r.{right_ts}
"""


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    inclusive: str = "both",
) -> DataFrame:
    """value-in-[lo, hi] join with the interval side broadcast (for small
    interval tables — tiers, buckets, calendars)."""
    lo_ok = (
        F.col(value_col) >= F.col(lo_col)
        if inclusive in ("both", "left")
        else F.col(value_col) > F.col(lo_col)
    )
    hi_ok = (
        F.col(value_col) <= F.col(hi_col)
        if inclusive in ("both", "right")
        else F.col(value_col) < F.col(hi_col)
    )
    return facts.join(F.broadcast(intervals), lo_ok & hi_ok)


def binned_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Big-big range join: grid both sides on ``bin_width`` so candidates
    meet on an equi-join bin key; the exact predicate filters after.
    Intervals explode into ceil(span/bin_width)+1 bin rows — choose the
    width near the median interval span."""
    f = facts.withColumn("__bin", F.floor(F.col(value_col) / bin_width).cast("long"))
    i = intervals.withColumn(
        "__bins",
        F.sequence(
            F.floor(F.col(lo_col) / bin_width).cast("long"),
            F.floor(F.col(hi_col) / bin_width).cast("long"),
        ),
    ).withColumn("__bin", F.explode("__bins")).drop("__bins")
    return (
        f.join(i, "__bin")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col)))
        .drop("__bin")
    )


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_unit: str = "hour",
) -> DataFrame:
    """Regularize an event stream onto a fixed time grid with
    forward-fill: ``(key, bucket_ts, value_filled, is_gap)``.

    The hypertable/time-series gap-fill operator (TimescaleDB's
    ``time_bucket_gapfill`` + ``locf``): per key, one row for every
    ``bucket_unit`` between that key's first and last observation;
    buckets with no observation carry the last observed value forward
    and are flagged ``is_gap``. Within a bucket the LAST observation
    wins, ordered by (ts, tiebreak) — the tiebreak column makes the
    pick deterministic when timestamps collide.

    Scale: the observation pass is one (key, bucket) window + the spine
    is one ``sequence`` explode per key — output is O(keys x span /
    bucket), linear, no range join. All shuffles key on the series key;
    a key's spine length is bounded by its observed span, so pick
    ``bucket_unit`` to match retention (hour-grain over years of data
    => ~10k rows per key). Values are carried, never recomputed — no
    float arithmetic, hash-stable across engines.
    """
    bucket = F.date_trunc(bucket_unit, F.col(ts_col))
    obs = df.select(
        F.col(key_col), bucket.alias("bucket_ts"), F.col(ts_col), F.col(tiebreak_col),
        F.col(value_col),
    )
    w_last = Window.partitionBy(key_col, "bucket_ts").orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    last_obs = (
        obs.withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .select(key_col, "bucket_ts", F.col(value_col).alias("__v"))
    )
    bounds = obs.groupBy(key_col).agg(
        F.min("bucket_ts").alias("__mn"), F.max("bucket_ts").alias("__mx")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.sequence("__mn", "__mx", F.expr(f"interval 1 {bucket_unit}"))
        ).alias("bucket_ts"),
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(last_obs, [key_col, "bucket_ts"], "left")
        .select(
            key_col,
            "bucket_ts",
            F.last("__v", ignorenulls=True).over(w_fill).alias("value_filled"),
            F.col("__v").isNull().alias("is_gap"),
        )
    )


def gap_fill_sql(
    table_expr: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_unit: str = "hour",
) -> str:
    """DuckDB twin of :func:`gap_fill` (generate_series spine +
    IGNORE NULLS window)."""
    return f"""
WITH obs AS (
    SELECT {key_col}, date_trunc('{bucket_unit}', {ts_col}) AS bucket_ts,
           {ts_col}, {tiebreak_col}, {value_col}
    FROM ({table_expr})
),
last_obs AS (
    SELECT {key_col}, bucket_ts, {value_col} AS __v
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY {key_col}, bucket_ts
            ORDER BY {ts_col} DESC, {tiebreak_col} DESC) AS __rn
        FROM obs
    ) WHERE __rn = 1
),
bounds AS (
    SELECT {key_col}, min(bucket_ts) AS __mn, max(bucket_ts) AS __mx
    FROM obs GROUP BY {key_col}
),
spine AS (
    SELECT {key_col},
           unnest(generate_series(__mn, __mx, INTERVAL 1 {bucket_unit})) AS bucket_ts
    FROM bounds
)
SELECT s.{key_col}, s.bucket_ts,
       last_value(l.__v IGNORE NULLS) OVER (
           PARTITION BY s.{key_col} ORDER BY s.bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
       l.__v IS NULL AS is_gap
FROM spine s
LEFT JOIN last_obs l
  ON s.{key_col} = l.{key_col} AND s.bucket_ts = l.bucket_ts
"""
