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
