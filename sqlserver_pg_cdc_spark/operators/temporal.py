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
    r_tagged = right.select(
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
