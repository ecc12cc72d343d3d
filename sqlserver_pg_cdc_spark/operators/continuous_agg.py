"""Continuous aggregates: incremental materialized aggregation.

TimescaleDB's continuous aggregates / Materialize-style incremental
view maintenance, restricted to the decomposable aggregate states
(count / sum / min / max — avg derives from sum & count at
finalization).  A scheduled pipeline keeps a STATE table per (bucket,
group) and on each refresh scans only the NEW partition, builds its
state, and merges — never re-reading the standing history.  The same
machinery serves CDC-fed rollups: apply each micro-batch's state delta
to the materialized aggregate.

Matches the incremental-checksum design (`operators/checksum.py` A4 +
`state.py`): scan work proportional to the delta, one merge shuffle
keyed on the group keys over STATE-sized frames (not raw rows).

Correctness contract: ``merge_states`` is associative and commutative
(integer/decimal sums, min/max), so any batch split of the input
finalizes bit-identically to the one-shot aggregate — the driver oracle
for the contract query is simply the full GROUP BY.

Caveat (inherent to the technique, same as every IVM engine): min/max
states are NOT retractable — deletes require re-aggregating the
affected buckets.  Sums/counts accept negative deltas (retractions) as
regular merges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# decimal sum state: double values are cast to DECIMAL(18,2) before
# summing (exact, order-independent, map-side combinable — and the
# double->decimal rounding agrees across Spark and DuckDB, see
# q_events_daily_revenue); Spark widens the running sum to DECIMAL(28,2)
_SUM_DEC = "decimal(18,2)"


def build_state(
    df: DataFrame,
    key_cols: list[Column | str],
    value_col: str,
    distinct_col: str | None = None,
) -> DataFrame:
    """Aggregate state for one batch/partition:
    ``(*keys, __n, __s, __mn, __mx[, __hll])``.  The sum state is widened
    to DECIMAL(38,2) so merged states and fresh deltas share one schema
    across parquet roundtrips (Spark widens decimal sums per level —
    without the cast, a persisted state and a new delta would disagree).

    ``distinct_col`` adds a MERGEABLE approximate-distinct state: a
    Datasketches HLL sketch (binary).  Sketch union is lossless — any
    batch split estimates identically to the one-shot sketch — which is
    what makes approx-distinct maintainable incrementally at all (exact
    distinct is not decomposable without keeping the full value set)."""
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col).cast(_SUM_DEC)).cast("decimal(38,2)").alias("__s"),
        F.min(value_col).alias("__mn"),
        F.max(value_col).alias("__mx"),
    ]
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(distinct_col).alias("__hll"))
    return df.groupBy(*key_cols).agg(*aggs)


def merge_states(states: list[DataFrame], key_cols: list[str]) -> DataFrame:
    """Merge state frames (associative + commutative). Missing groups
    on either side fall out naturally from the union."""
    if not states:
        raise ValueError("merge_states needs at least one state frame")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    aggs = [
        F.sum("__n").alias("__n"),
        F.sum("__s").cast("decimal(38,2)").alias("__s"),
        F.min("__mn").alias("__mn"),
        F.max("__mx").alias("__mx"),
    ]
    if "__hll" in u.columns:
        aggs.append(F.hll_union_agg("__hll").alias("__hll"))
    return u.groupBy(*key_cols).agg(*aggs)


def finalize(state: DataFrame, key_cols: list[str]) -> DataFrame:
    """Resolve a state frame to the user-facing aggregate:
    ``(*keys, n_events, total, avg, min_v, max_v)``.  avg divides the
    exact decimal total by the exact count IN DOUBLE (identical
    operands on both engines -> identical quotient)."""
    cols = [
        F.col("__n").cast("long").alias("n_events"),
        F.col("__s").cast("double").alias("total"),
        (F.col("__s").cast("double") / F.col("__n").cast("double")).alias("avg"),
        F.col("__mn").alias("min_v"),
        F.col("__mx").alias("max_v"),
    ]
    if "__hll" in state.columns:
        cols.append(
            F.hll_sketch_estimate("__hll").cast("long").alias("n_distinct_approx")
        )
    return state.select(*key_cols, *cols)


def continuous_agg_oracle_sql(
    table_expr: str, key_select: str, key_group: str, value_col: str
) -> str:
    """The one-shot GROUP BY any batch split must reproduce exactly.
    ``key_select`` are the key output expressions (aliased),
    ``key_group`` the matching GROUP BY list."""
    return f"""
SELECT {key_select},
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST({value_col} AS DECIMAL(18,2))) AS DOUBLE) AS total,
       CAST(sum(CAST({value_col} AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg,
       min({value_col}) AS min_v,
       max({value_col}) AS max_v
FROM ({table_expr})
GROUP BY {key_group}
"""
