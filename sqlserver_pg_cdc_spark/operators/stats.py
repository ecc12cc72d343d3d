"""Cross-series statistics: pairwise Pearson correlation over aligned
time buckets.

The time-series analytics step (co-moving entities, redundant sensors,
correlated user cohorts): bucket each key's series onto a shared grid,
align pairs on the bucket, and compute correlation from EXACT decimal
moments so both engines derive bit-identical doubles (built-in ``corr``
aggregates sum doubles in engine-specific order — never hash-stable).

The large decimal sums cross into double space through VARCHAR
(``CAST(CAST(x AS VARCHAR) AS DOUBLE)`` on the DuckDB side): DuckDB's
direct decimal->double cast double-rounds at this magnitude (see
functions/canonical.py).

Scale: the bucket aggregation is linear; the pair join is keyed on the
bucket, so its size is Σ_bucket (active keys in bucket)² — quadratic in
CONCURRENT keys, not total rows. That is the honest cost of all-pairs
correlation; beyond bounded key cardinality, pre-select candidate pairs
(sketch/LSH on series signatures) before the exact pass, the same
candidates-then-verify shape as the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def series_correlation(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_unit: str = "day",
    min_buckets: int = 3,
) -> DataFrame:
    """Pearson correlation for every key pair over their shared
    buckets: ``(a, b, n_buckets, corr)`` with a < b.

    Per-bucket series value = exact decimal sum of the key's values in
    the bucket. Pairs with fewer than ``min_buckets`` shared buckets or
    zero variance on either side are dropped (undefined correlation).
    """
    dec = F.col(value_col).cast("decimal(18,2)")
    series = (
        df.select(
            F.col(key_col).alias("k"),
            F.date_trunc(bucket_unit, F.col(ts_col)).alias("b"),
            dec.alias("v"),
        )
        .groupBy("k", "b")
        # keep the series value at (18,2): products must stay inside
        # decimal(38,4) EXACTLY on both engines ((18,2)^2 -> (37,4));
        # a wider series type would force precision-loss rounding
        .agg(F.sum("v").cast("decimal(18,2)").alias("v"))
    )
    a = series.select(F.col("k").alias("a"), "b", F.col("v").alias("x"))
    bfr = series.select(F.col("k").alias("b_key"), "b", F.col("v").alias("y"))
    paired = a.join(bfr, "b").filter(F.col("a") < F.col("b_key"))
    moments = paired.groupBy("a", F.col("b_key").alias("b")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(38,2)").alias("sx"),
        F.sum("y").cast("decimal(38,2)").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,4)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return (
        moments.filter(F.col("n") >= min_buckets)
        .withColumn("__vx", varx)
        .withColumn("__vy", vary)
        # zero-variance sides have undefined correlation: gate BEFORE
        # dividing (double x/0 yields inf/nan, not NULL)
        .filter((F.col("__vx") > 0) & (F.col("__vy") > 0))
        .withColumn("corr", cov / (F.sqrt(F.col("__vx")) * F.sqrt(F.col("__vy"))))
        .select("a", "b", F.col("n").cast("long").alias("n_buckets"), "corr")
    )


def series_correlation_sql(
    table_expr: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_unit: str = "day",
    min_buckets: int = 3,
) -> str:
    def vd(x: str) -> str:  # decimal -> double via correctly-rounded parse
        return f"CAST(CAST({x} AS VARCHAR) AS DOUBLE)"

    return f"""
WITH series AS (
    SELECT {key_col} AS k, date_trunc('{bucket_unit}', {ts_col}) AS b,
           CAST(sum(CAST({value_col} AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
    FROM ({table_expr})
    GROUP BY 1, 2
),
paired AS (
    SELECT s1.k AS a, s2.k AS b_key, s1.v AS x, s2.v AS y
    FROM series s1 JOIN series s2 ON s1.b = s2.b AND s1.k < s2.k
),
moments AS (
    SELECT a, b_key AS b, count(*) AS n,
           CAST(sum(x) AS DECIMAL(38,2)) AS sx,
           CAST(sum(y) AS DECIMAL(38,2)) AS sy,
           sum(CAST(x * y AS DECIMAL(38,4))) AS sxy,
           sum(CAST(x * x AS DECIMAL(38,4))) AS sxx,
           sum(CAST(y * y AS DECIMAL(38,4))) AS syy
    FROM paired GROUP BY 1, 2
),
gated AS (
    SELECT a, b, n,
           CAST(n AS DOUBLE) * {vd('sxy')} - {vd('sx')} * {vd('sy')} AS cov,
           CAST(n AS DOUBLE) * {vd('sxx')} - {vd('sx')} * {vd('sx')} AS vx,
           CAST(n AS DOUBLE) * {vd('syy')} - {vd('sy')} * {vd('sy')} AS vy
    FROM moments WHERE n >= {min_buckets}
)
SELECT a, b, CAST(n AS BIGINT) AS n_buckets,
       cov / (sqrt(vx) * sqrt(vy)) AS corr
FROM gated WHERE vx > 0 AND vy > 0
"""
