"""Canonicalization parity: Spark expressions vs DuckDB SQL must produce
bit-identical canonical strings and row hashes on real testdata."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.functions.canonical import (
    canon_col,
    canon_sql,
    row_canonical,
    row_hash,
    row_hash_sql,
)
from tests.conftest import load


TABLES_WITH_KEYS = [
    ("customer", "c_custkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
]


@pytest.mark.parametrize("table,key", TABLES_WITH_KEYS)
def test_row_hash_parity(spark, duck, table, key):
    df = load(spark, table)
    fields = [(f.name, f.dataType) for f in df.schema.fields]
    spark_rows = {
        r[key]: r["h"]
        for r in df.select(key, row_hash(df).alias("h")).collect()
    }
    duck_rows = {
        r[0]: r[1]
        for r in duck.execute(
            f"SELECT {key}, {row_hash_sql(fields)} FROM {table}"
        ).fetchall()
    }
    assert spark_rows == duck_rows


def test_null_token(spark):
    df = spark.createDataFrame([(1, None)], "id int, v string")
    row = df.select(row_canonical(df).alias("c")).collect()[0]
    assert row["c"] == "1|NULL"


def test_canon_double_fixed_scale(spark):
    df = spark.createDataFrame([(185.22,), (None,)], "v double")
    vals = [r["c"] for r in df.select(canon_col("v", df.schema[0].dataType).alias("c")).collect()]
    assert vals == ["185.220000", "NULL"]


def test_canon_sql_matches_spark_on_literals(spark, duck):
    # timestamp + date + bool + binary canonical forms, one engine vs the other
    df = spark.sql(
        "SELECT timestamp'2024-01-01 00:09:58.778549' AS ts, date'2024-01-02' AS d, "
        "true AS b, cast('ab' as binary) AS bin"
    )
    exprs = [canon_col(f.name, f.dataType).alias(f.name) for f in df.schema.fields]
    srow = df.select(*exprs).collect()[0].asDict()
    sql_parts = ", ".join(
        f"{canon_sql(f.name, f.dataType)} AS {f.name}" for f in df.schema.fields
    )
    drow = duck.execute(
        f"SELECT {sql_parts} FROM (SELECT TIMESTAMP '2024-01-01 00:09:58.778549' AS ts, "
        f"DATE '2024-01-02' AS d, true AS b, 'ab'::BLOB AS bin)"
    ).fetchdf().iloc[0].to_dict()
    assert srow == drow


def test_full_avro_type_matrix_parity(spark, duck, tmp_path):
    """Reference SQLServer->Avro->PG matrix (research.md:369-390): one
    synthetic frame carrying every mapped type, written once, hashed by
    both engines — canonical strings must be bit-identical, including
    NULLs in every column."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("c_int", T.IntegerType(), True),        # INT
            T.StructField("c_small", T.ShortType(), True),        # SMALLINT
            T.StructField("c_tiny", T.ByteType(), True),          # TINYINT
            T.StructField("c_big", T.LongType(), True),           # BIGINT
            T.StructField("c_dec", T.DecimalType(18, 4), True),   # DECIMAL precise
            T.StructField("c_dbl", T.DoubleType(), True),         # FLOAT
            T.StructField("c_flt", T.FloatType(), True),          # REAL
            T.StructField("c_str", T.StringType(), True),         # VARCHAR/NVARCHAR
            T.StructField("c_date", T.DateType(), True),          # DATE
            T.StructField("c_ts", T.TimestampNTZType(), True),    # DATETIME2 micros
            T.StructField("c_bit", T.BooleanType(), True),        # BIT
            T.StructField("c_bin", T.BinaryType(), True),         # VARBINARY
        ]
    )
    import datetime
    from decimal import Decimal

    rows = [
        (
            1, 42, 7, 3, 9_007_199_254_740_993,
            Decimal("1234.5000"), 185.22, 2.5,
            "unicode: ü€ 漢", datetime.date(2024, 2, 29),
            datetime.datetime(2024, 1, 15, 10, 30, 0, 123456),
            True, b"\x00\xffab",
        ),
        (2,) + (None,) * 12,
    ]
    path = str(tmp_path / "matrix.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)

    df = spark.read.parquet(path)
    fields = [(f.name, f.dataType) for f in df.schema.fields]
    got = {
        r["k"]: r["h"] for r in df.select("k", row_hash(df).alias("h")).collect()
    }
    duck.execute(f"CREATE OR REPLACE VIEW matrix AS SELECT * FROM '{path}/*.parquet'")
    want = {
        r[0]: r[1]
        for r in duck.execute(
            f"SELECT k, {row_hash_sql(fields)} FROM matrix"
        ).fetchall()
    }
    assert got == want


def test_logical_overlay_parity(spark, duck):
    """TIME-micros / DATETIMEOFFSET / UUID overlays: semantic canonical
    forms agree across engines (offsets collapse to the UTC instant,
    GUIDs to lowercase)."""
    from sqlserver_pg_cdc_spark.functions.canonical import (
        canon_logical,
        canon_logical_sql,
    )

    cases = [
        # (logical, spark literal sql, duck literal sql)
        ("time-micros", "CAST(37230123456 AS LONG)", "CAST(37230123456 AS BIGINT)"),
        ("time-micros", "CAST(NULL AS LONG)", "CAST(NULL AS BIGINT)"),
        ("datetimeoffset", "'2024-01-15T10:30:00.123456+05:30'", "'2024-01-15T10:30:00.123456+05:30'"),
        ("datetimeoffset", "'2024-01-15 05:00:00.123456+00:00'", "'2024-01-15 05:00:00.123456+00:00'"),
        ("datetimeoffset", "CAST(NULL AS STRING)", "CAST(NULL AS VARCHAR)"),
        ("uuid", "'3F2504E0-4F89-11D3-9A0C-0305E82C3301'", "'3F2504E0-4F89-11D3-9A0C-0305E82C3301'"),
    ]
    for logical, s_lit, d_lit in cases:
        s_val = spark.sql(
            f"SELECT {s_lit} AS v"
        ).select(canon_logical("v", logical).alias("c")).collect()[0]["c"]
        d_val = duck.execute(
            f"SELECT {canon_logical_sql('v', logical)} FROM (SELECT {d_lit} AS v)"
        ).fetchone()[0]
        assert s_val == d_val, f"{logical}: spark={s_val!r} duck={d_val!r}"
    # the two offset forms above denote the same instant -> same canonical
    a = spark.sql("SELECT '2024-01-15T10:30:00.123456+05:30' AS v").select(
        canon_logical("v", "datetimeoffset").alias("c")
    ).collect()[0]["c"]
    b = spark.sql("SELECT '2024-01-15 05:00:00.123456+00:00' AS v").select(
        canon_logical("v", "datetimeoffset").alias("c")
    ).collect()[0]["c"]
    assert a == b
