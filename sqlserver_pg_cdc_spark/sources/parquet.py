"""Parquet table source with schema normalization.

Spark's parquet reader rejects TIMESTAMP(NANOS) columns (it supports only
micros/millis). With ``spark.sql.legacy.parquet.nanosAsLong=true`` they
arrive as raw nanosecond longs; this loader inspects the parquet footer
(pyarrow) and converts them to proper ``TimestampType`` micros — the same
truncation DuckDB applies when it coerces ns to its microsecond TIMESTAMP,
so both engines see identical values.

Scale note: the footer inspection reads one file's metadata, never data.
"""

from __future__ import annotations

import glob
import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover
        return ()
    import pyarrow as pa

    files = [path]
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet"))) or [path]
    try:
        schema = pq.read_schema(files[0])
    except Exception:  # pragma: no cover
        return ()
    return tuple(
        name
        for name, typ in zip(schema.names, schema.types)
        if pa.types.is_timestamp(typ) and typ.unit == "ns"
    )


def ensure_session_confs(spark: SparkSession) -> None:
    """Make a caller-provided session safe for this engine.

    The driver hands us an arbitrary SparkSession; these are runtime-settable
    SQL confs the engine's correctness depends on (UTC pinning for
    cross-engine timestamp parity, nanos handling for ns-parquet reads).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with normalized types."""
    ensure_session_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    from pyspark.sql.types import LongType

    dtypes = {f.name: f.dataType for f in df.schema.fields}
    for col in _nanos_timestamp_cols(path):
        # floor-divide nanos to micros; 'div' is integer division.
        # Guard on the Spark-side dtype: pyarrow also reports legacy
        # INT96 timestamps as unit 'ns', but Spark reads those as proper
        # TimestampType (nanosAsLong only affects int64 TIMESTAMP(NANOS))
        # — converting them again would be a type error.
        if isinstance(dtypes.get(col), LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # tz-less parquet timestamps arrive as TIMESTAMP_NTZ (Spark 4); the
    # engine standardizes on TIMESTAMP with the session pinned to UTC
    # (value-identical, and watermarks/unix_millis require it)
    from pyspark.sql.types import TimestampNTZType

    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view for the SQL entry point."""
    for t in tables or TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
