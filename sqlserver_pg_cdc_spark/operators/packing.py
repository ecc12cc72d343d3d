"""Sequence packing: bin documents into fixed token-budget training
sequences.

Before LLM training, a corpus is packed into fixed-length context
windows (e.g. 2k/8k tokens): walk documents in a deterministic order
and greedily fill a bin until the next document would overflow it, then
open a new bin.  The assignment (doc -> bin) is the standard greedy
first-fit-in-order packing every training-data pipeline performs, and
utilization (packed tokens / bin capacity) is a headline corpus metric.

Spark-first shape: packing is inherently sequential *within* a shard
(each bin depends on the running fill before it), but embarrassingly
parallel *across* shards.  We therefore pack with ``applyInPandas`` per
group (one Arrow batch per shard, a tight numpy loop inside — no
row-at-a-time Python), keyed by the corpus's natural shard column
(``source`` here).  At 100 TB the group key must bound per-task data:
use (source, range-chunk-of-order-col) as the group key so each task
packs a bounded slice; chunk boundaries only cost one partially-filled
bin per chunk.

Oracle: the same greedy recurrence expressed as a DuckDB recursive CTE
(rn -> rn+1 within each group), exact because all arithmetic is integer.

This is an extension beyond the reference's reconciliation surface
(BASELINE.json north star: training-data pipeline operators).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    token_col: str,
    capacity: int,
    bin_col: str = "bin_id",
    fill_col: str = "bin_fill",
) -> DataFrame:
    """Greedy in-order packing of rows into token bins per group.

    Semantics (exact, integer):
      - rows are processed in ascending ``order_col`` within each
        ``group_col`` partition;
      - the first row of a group always opens bin 0 (an oversize
        document occupies its own bin rather than erroring);
      - a row whose tokens would push the running fill past ``capacity``
        closes the bin and opens the next one.

    Returns the input columns plus ``bin_col`` (0-based per group) and
    ``fill_col`` (running fill of the bin *after* placing the row — the
    last row of a bin carries its final utilization).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(bin_col, T.LongType(), False),
            T.StructField(fill_col, T.LongType(), False),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        toks = pdf[token_col].to_numpy()
        bins = [0] * len(toks)
        fills = [0] * len(toks)
        bin_id, fill = 0, 0
        for i, t in enumerate(toks):
            # NULL token counts (e.g. token_count of a NULL text) arrive
            # as NaN through Arrow — pack as zero-length, mirrored by
            # the coalesce in the SQL recurrence
            t = 0 if pd.isna(t) else int(t)
            if fill > 0 and fill + t > capacity:
                bin_id += 1
                fill = t
            else:
                fill += t
            bins[i] = bin_id
            fills[i] = fill
        pdf[bin_col] = pd.array(bins, dtype="int64")
        pdf[fill_col] = pd.array(fills, dtype="int64")
        return pdf[in_cols + [bin_col, fill_col]]

    return df.groupBy(group_col).applyInPandas(_pack, schema=out_schema)


def pack_sequences_sql(
    table_expr: str,
    group_col: str,
    order_col: str,
    token_col: str,
    capacity: int,
    bin_col: str = "bin_id",
    fill_col: str = "bin_fill",
) -> str:
    """DuckDB twin of :func:`pack_sequences`: the greedy recurrence as a
    recursive CTE stepping rn -> rn+1 within each group.  Validation
    scale only (recursion depth = max rows per group); the Spark path is
    the production one."""
    return f"""
WITH RECURSIVE docs AS (
    SELECT *,
           row_number() OVER (PARTITION BY {group_col} ORDER BY {order_col}) AS __rn
    FROM {table_expr}
),
pack AS (
    -- coalesce mirrors the packer's NULL-token-as-zero rule
    SELECT docs.*, CAST(0 AS BIGINT) AS {bin_col},
           CAST(coalesce({token_col}, 0) AS BIGINT) AS {fill_col}
    FROM docs WHERE __rn = 1
    UNION ALL
    SELECT d.*,
           CASE WHEN p.{fill_col} > 0
                 AND p.{fill_col} + coalesce(d.{token_col}, 0) > {capacity}
                THEN p.{bin_col} + 1 ELSE p.{bin_col} END,
           CASE WHEN p.{fill_col} > 0
                 AND p.{fill_col} + coalesce(d.{token_col}, 0) > {capacity}
                THEN CAST(coalesce(d.{token_col}, 0) AS BIGINT)
                ELSE p.{fill_col} + coalesce(d.{token_col}, 0) END
    FROM pack p
    JOIN docs d
      -- null-safe group match: a NULL shard key is one group in the
      -- window numbering, so the recursion must follow it too
      ON d.{group_col} IS NOT DISTINCT FROM p.{group_col}
     AND d.__rn = p.__rn + 1
)
SELECT * EXCLUDE (__rn) FROM pack
"""


def packing_stats(
    packed: DataFrame,
    group_col: str,
    token_col: str,
    capacity: int,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Per-group packing summary: bins used, docs and tokens packed, and
    utilization = packed tokens / (bins * capacity).  One shuffle on the
    group key; utilization arithmetic in exact-then-double so it hashes
    identically across engines."""
    return (
        packed.groupBy(group_col)
        .agg(
            (F.max(bin_col) + F.lit(1)).cast("long").alias("n_bins"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
        )
        .withColumn(
            "utilization",
            (
                F.col("n_tokens").cast("double")
                / (F.col("n_bins") * F.lit(capacity)).cast("double")
            ),
        )
    )


def packing_stats_sql(
    packed_sql: str,
    group_col: str,
    token_col: str,
    capacity: int,
    bin_col: str = "bin_id",
) -> str:
    return f"""
SELECT {group_col},
       CAST(max({bin_col}) + 1 AS BIGINT) AS n_bins,
       count(*) AS n_docs,
       CAST(sum(CAST({token_col} AS BIGINT)) AS BIGINT) AS n_tokens,
       CAST(sum(CAST({token_col} AS BIGINT)) AS DOUBLE)
         / CAST((max({bin_col}) + 1) * {capacity} AS DOUBLE) AS utilization
FROM ({packed_sql})
GROUP BY {group_col}
"""


def pack_chunked(
    df: DataFrame,
    group_col: str,
    order_col: str,
    token_col: str,
    capacity: int,
    chunk_rows: int,
    bin_col: str = "bin_id",
    fill_col: str = "bin_fill",
) -> DataFrame:
    """Scale variant: bound per-task memory by sub-chunking each group
    on the order column before packing, then offsetting bin ids so they
    stay globally unique and monotone within the group.

    Each chunk packs independently (cost: at most one partially-filled
    bin per chunk boundary).  Bin ids are made global in two steps, both
    shuffle-light: per-chunk max-bin counts are tiny (one row per
    chunk), so the running offset join broadcasts.
    """
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(order_col)
    )
    chunked = df.withColumn("__chunk", ((rn - F.lit(1)) / F.lit(chunk_rows)).cast("long"))
    packed = pack_sequences(
        chunked.withColumn("__gc", F.concat_ws("\u0001", group_col, "__chunk")),
        "__gc",
        order_col,
        token_col,
        capacity,
        bin_col=bin_col,
        fill_col=fill_col,
    )
    # per-(group, chunk) bin counts -> running offset; tiny frame, broadcast
    counts = (
        packed.groupBy(group_col, "__chunk")
        .agg((F.max(bin_col) + 1).alias("__bins"))
    )
    offsets = counts.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__bins").over(
                Window.partitionBy(group_col)
                .orderBy("__chunk")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).drop("__bins")
    return (
        packed.join(F.broadcast(offsets), [group_col, "__chunk"])
        .withColumn(bin_col, (F.col(bin_col) + F.col("__offset")).cast("long"))
        .drop("__chunk", "__gc", "__offset")
    )
