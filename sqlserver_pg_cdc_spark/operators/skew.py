"""Skew mitigation: salted aggregation and salted broadcast-side joins.

At 100 TB a handful of hot keys (one customer with 1% of all orders, one
null-ish default key) can pin a shuffle partition for hours. Two standard
remedies, engine-packaged:

- ``salted_aggregate``: two-phase aggregation — phase 1 groups on
  (key, salt) spreading a hot key over N partitions, phase 2 merges the
  partials. Correct for any algebraic aggregate expressed as
  (partial, merge) pairs.
- ``salted_broadcast_join``: replicate the (small) build side N ways so a
  skewed probe key hashes across N tasks instead of one.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins
automatically at runtime; these helpers are for the aggregation case and
for forcing the plan when AQE statistics are not available (first run,
streaming micro-batches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n: int, col_name: str = "__salt") -> DataFrame:
    """Uniform pseudo-random salt in [0, n) — derived from the row via
    monotonically_increasing_id so it is cheap and shuffle-free."""
    return df.withColumn(col_name, (F.monotonically_increasing_id() % n).cast("int"))


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt: int = 8,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` aggregate within (group, salt); ``merge_aggs``
    combine the partials per group, referencing the partial output
    columns. Example::

        salted_aggregate(
            orders, ["o_custkey"],
            partial_aggs={"cnt": F.count(F.lit(1)),
                          "total": F.sum(F.col("o_totalprice").cast("decimal(18,2)"))},
            merge_aggs={"cnt": F.sum("cnt"), "total": F.sum("total")},
        )
    """
    salted = with_salt(df, salt)
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return phase1.groupBy(*group_cols).agg(
        *[expr.alias(name) for name, expr in merge_aggs.items()]
    )


def salted_broadcast_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed large side against a small side with the small side
    replicated ``salt`` ways, so one hot key spreads over ``salt`` tasks.

    Only probe-side-preserving modes are valid: a replicated build side
    would emit ``salt`` copies of every unmatched small row under
    right/full outer joins."""
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_broadcast_join supports {sorted(allowed)}; got {how!r}"
        )
    salts = large.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
    large_s = with_salt(large, salt)
    small_s = small.crossJoin(F.broadcast(salts))
    joined = large_s.join(F.broadcast(small_s), [*on, "__salt"], how)
    return joined.drop("__salt")
