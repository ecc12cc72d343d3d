"""Bucketed table layout for shuffle-free repeated reconciliation.

The reconciler's core join (the full-outer PK diff, `operators/diff.py`)
shuffles both tables on the primary key every run.  For scheduled
reconciliation (the reference's cron-driven `reconcile schedule`,
src/cli/parser.py) that shuffle is paid daily on tables that barely
change.  Hive-style bucketing amortizes it: write both sides bucketed
(and sorted) by the PK once, and every subsequent equi-join / groupBy on
that key reads co-located, pre-sorted buckets — Catalyst drops the
Exchange (and with sorted buckets, the Sort) from the plan entirely.

At warehouse scale this is the difference between O(table) network per
reconcile run and zero: with 1024 buckets on a 100 TB table, each of the
1024 tasks reads its bucket from both sides locally.  The bucket count
is a layout-time choice: aim for buckets of 100-500 MB at the target
scale (buckets too few -> giant tasks; too many -> small-file overhead).

Spark bucketing only applies through the catalog (``saveAsTable``) — a
plain ``spark.read.parquet`` of the same files ignores bucket metadata.
These helpers always register external tables with an explicit path, so
the data stays where the caller puts it and survives catalog drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed (and by default sorted)
    table. Joins and aggregations keyed on ``bucket_cols`` against
    other tables bucketed the same way (same cols, same count) then
    plan with no Exchange."""
    writer = df.write.format("parquet").mode(mode).option("path", path)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog (bucket metadata only
    attaches on the table read path, never on raw parquet paths)."""
    return spark.table(table_name)


def is_colocated(a: DataFrame, b: DataFrame, join_cols: list[str]) -> bool:
    """True when an equi-join of ``a`` and ``b`` on ``join_cols`` plans
    without a shuffle exchange — the check a scheduler can run before
    choosing the bucketed fast path."""
    joined = a.join(b, join_cols)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
