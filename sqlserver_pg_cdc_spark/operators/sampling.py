"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent per partitioning and not reproducible
across engines or re-runs with different file splits. These samplers
derive the keep/drop decision from a content hash of the key, so the
sample is a pure function of the data:

- ``deterministic_sample``: keep rows whose md5(key) mod 10^6 falls
  under the fraction — stable across engines, partitionings, and runs;
  also gives consistent train/holdout splits (disjoint fractions).
- ``stratified_sample``: at most n rows per stratum, chosen by hash
  order (a deterministic shuffle), via a per-stratum row_number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _hash_bucket(key_col: str):
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10)
        .cast("bigint"),
        F.lit(_BUCKETS),
    )


def _hash_bucket_sql(key_col: str) -> str:
    return (
        f"((('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 12))::BIGINT) % {_BUCKETS})"
    )


def deterministic_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Content-hash Bernoulli sample: stable under re-runs and engines."""
    threshold = int(fraction * _BUCKETS)
    return df.filter(_hash_bucket(key_col) < threshold)


def deterministic_sample_sql(table: str, key_col: str, fraction: float) -> str:
    threshold = int(fraction * _BUCKETS)
    return f"SELECT * FROM {table} WHERE {_hash_bucket_sql(key_col)} < {threshold}"


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, fraction: float
) -> DataFrame:
    """Quality-weighted Bernoulli sample: keep probability =
    clamp(weight, 0, 1) * fraction, decided by the same content hash —
    the deterministic form of temperature/quality sampling a training
    pipeline uses to up-weight good documents. Reproducible across
    engines, partitionings, and runs; still O(scan) with the predicate
    evaluated in codegen."""
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    threshold = F.floor(w * F.lit(float(fraction)) * F.lit(_BUCKETS))
    return df.filter(_hash_bucket(key_col) < threshold)


def weighted_sample_sql(
    table: str, key_col: str, weight_col: str, fraction: float
) -> str:
    w = (
        f"least(greatest(CAST({weight_col} AS DOUBLE), CAST(0 AS DOUBLE)),"
        f" CAST(1 AS DOUBLE))"
    )
    threshold = f"floor({w} * CAST({float(fraction)!r} AS DOUBLE) * {_BUCKETS})"
    return f"SELECT * FROM {table} WHERE {_hash_bucket_sql(key_col)} < {threshold}"


def stratified_sample(
    df: DataFrame, strata_cols: list[str], key_col: str, n_per_stratum: int
) -> DataFrame:
    """<= n rows per stratum, selected by hash order (deterministic)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        _hash_bucket(key_col), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def stratified_sample_sql(
    table: str, strata_cols: list[str], key_col: str, n_per_stratum: int
) -> str:
    strata = ", ".join(strata_cols)
    return f"""
SELECT * EXCLUDE (__rn) FROM (
    SELECT *, row_number() OVER (
        PARTITION BY {strata}
        ORDER BY {_hash_bucket_sql(key_col)}, {key_col}
    ) AS __rn
    FROM {table}
) WHERE __rn <= {n_per_stratum}
"""
