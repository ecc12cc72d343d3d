"""Count-min sketch: mergeable frequency estimation for heavy hitters.

The missing piece between exact top-k (``vocab_topk`` — a full groupBy
over the whole vocabulary) and nothing: at 100 TB the exact token
count table is itself huge, but a count-min sketch is a FIXED d×w grid
of counters (here 4×1024 = 4096 cells) that

- builds in one pass: each occurrence increments d cells, one per
  sketch row, at positions derived from the item's md5 (the same
  deterministic double-hash family as ``operators/bloom.py`` — both
  engines compute identical bits, so even estimation error matches the
  oracle exactly);
- merges by CELL-WISE SUM: per-partition / per-day / per-shard
  sketches combine associatively, the same property that makes the
  incremental checksum and continuous-agg states maintainable — a
  streaming foreachBatch can keep one tiny sketch table current
  forever;
- answers point queries as min over the item's d cells, an
  OVERESTIMATE by at most the collision mass (Pr[err > 2N/w] < (1/2)^d
  with the classic bounds).

Reference analog: none (the reference has no sketches); this extends
the LLM-pipeline surface (SURVEY §6) where heavy-hitter token stats at
corpus scale cannot afford the exact vocabulary shuffle.

Spark-first shape: the build is explode + groupBy(row, cell) with
map-side combine — one bounded shuffle; estimation joins candidates to
the sketch on (row, cell) — a broadcast-sized build side at any corpus
scale, since the sketch is ≤ d*w rows by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D = 4  # sketch rows (hash functions)
_W = 1024  # counters per row


def _hash_halves(item: Column) -> tuple[Column, Column]:
    """(a, b) 48-bit halves of md5(item); b forced odd so the double
    hash h_i = (a + i*b) mod w never degenerates (w is a power of two,
    odd b is coprime to it)."""
    h = F.md5(item)
    a = F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint")
    b = (
        F.conv(F.substring(h, 13, 12), 16, 10)
        .cast("bigint")
        .bitwiseOR(F.lit(1))
    )
    return a, b


def _cells(item: Column, d: int, w: int) -> Column:
    """array<struct<row,cell>> — the d sketch cells of one item."""
    a, b = _hash_halves(item)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(a + F.lit(i) * b, F.lit(w)).alias("cell"),
            )
            for i in range(d)
        ]
    )


def cms_build(
    df: DataFrame, item_col: str, d: int = _D, w: int = _W
) -> DataFrame:
    """Build the sketch over one occurrence per input row:
    ``(row, cell, cnt)``, at most d*w rows regardless of input size.

    One explode (d cells per occurrence) + one groupBy — map-side
    partial sums keep the shuffle at d*w keys. Persist the result as a
    table; union + re-aggregate (:func:`cms_merge`) folds new
    partitions in.
    """
    return (
        df.select(F.explode(_cells(F.col(item_col), d, w)).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Cell-wise sum of sketches built with the same (d, w) — the
    associative merge that makes the sketch maintainable per
    shard/day/stream batch."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("row", "cell").agg(F.sum("cnt").cast("long").alias("cnt"))


def cms_estimate(
    items: DataFrame,
    sketch: DataFrame,
    item_col: str,
    d: int = _D,
    w: int = _W,
    est_col: str = "cms_est",
) -> DataFrame:
    """Point-query estimates for a candidate frame: min over the item's
    d cells. The sketch side is ≤ d*w rows — broadcast it so candidate
    estimation never shuffles the candidate frame."""
    exploded = items.select(
        item_col, F.explode(_cells(F.col(item_col), d, w)).alias("rc")
    ).select(item_col, F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
    joined = exploded.join(F.broadcast(sketch), ["row", "cell"], "left")
    return (
        joined.groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias(est_col))
        .join(items, item_col)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins (same md5-derived family, identical bits)
# ---------------------------------------------------------------------------


def _ab_sql(item_sql: str) -> tuple[str, str]:
    a = f"(('0x' || substr(md5({item_sql}), 1, 12))::BIGINT)"
    b = f"((('0x' || substr(md5({item_sql}), 13, 12))::BIGINT) | 1)"
    return a, b


def cms_build_sql(occurrences_sql: str, item_sql: str, d: int = _D, w: int = _W) -> str:
    """Sketch of one occurrence per row of ``occurrences_sql``
    (generate_series cross join — the same trick as the codec oracles)."""
    a, b = _ab_sql(item_sql)
    return f"""
SELECT t.i AS row, ({a} + t.i * {b}) % {w} AS cell,
       CAST(count(*) AS BIGINT) AS cnt
FROM ({occurrences_sql}) o
JOIN generate_series(0, {d - 1}) AS t(i) ON true
GROUP BY 1, 2
"""


def cms_estimate_sql(
    candidates_sql: str,
    sketch_sql: str,
    item_col: str,
    d: int = _D,
    w: int = _W,
    est_col: str = "cms_est",
) -> str:
    """min-over-cells estimates for a candidate list."""
    a, b = _ab_sql(item_col)
    return f"""
SELECT c.*, e.{est_col}
FROM ({candidates_sql}) c
JOIN (
    SELECT {item_col},
           CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS {est_col}
    FROM (
        SELECT {item_col}, t.i AS row, ({a} + t.i * {b}) % {w} AS cell
        FROM ({candidates_sql}) cc
        JOIN generate_series(0, {d - 1}) AS t(i) ON true
    ) x
    LEFT JOIN ({sketch_sql}) s ON x.row = s.row AND x.cell = s.cell
    GROUP BY {item_col}
) e USING ({item_col})
"""
