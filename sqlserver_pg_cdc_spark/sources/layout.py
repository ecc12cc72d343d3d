"""Physical layout: partitioned and bucketed writes (the advisor's
recommendations, materialized).

- ``write_partitioned``: hive-style directory partitioning so selective
  reads prune whole partitions at the scan (the 100 TB replacement for
  b-tree indexes on filter columns).
- ``write_bucketed``: hash-bucketed managed table on the join key; two
  tables bucketed the same way join with NO shuffle on either side —
  the co-located join the reference can only get from database indexes.

Bucketing requires the table catalog (saveAsTable); partitioned writes
work on plain paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
