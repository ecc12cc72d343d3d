"""Bucketed-layout reconciliation: the PK diff over two tables written
bucketed by the key must plan with NO shuffle exchange, and must return
the same discrepancies as the plain-parquet path."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.diff import diff_tables
from sqlserver_pg_cdc_spark.sources.layout import (
    is_colocated,
    read_table,
    write_bucketed,
)
from sqlserver_pg_cdc_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_orders(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    src = load_table(spark, SF, "orders")
    tgt = (
        src.filter(F.col("o_orderkey") % 97 != 0)  # some rows missing
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
    )
    write_bucketed(
        src, "t_src_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(base / "src"),
    )
    write_bucketed(
        tgt, "t_tgt_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(base / "tgt"),
    )
    yield read_table(spark, "t_src_orders"), read_table(spark, "t_tgt_orders"), src, tgt
    spark.sql("DROP TABLE IF EXISTS t_src_orders")
    spark.sql("DROP TABLE IF EXISTS t_tgt_orders")


def test_bucketed_diff_has_no_shuffle(spark, bucketed_orders):
    bsrc, btgt, _, _ = bucketed_orders
    # force the sort-merge path (at this test scale AQE would broadcast,
    # which hides whether bucketing removed the shuffle)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert is_colocated(bsrc, btgt, ["o_orderkey"])
        d = diff_tables(bsrc, btgt, ["o_orderkey"])
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_plain_parquet_is_not_colocated(spark, bucketed_orders):
    _, btgt, src, _ = bucketed_orders
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert not is_colocated(src, btgt, ["o_orderkey"])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_diff_matches_plain_diff(spark, bucketed_orders):
    bsrc, btgt, src, tgt = bucketed_orders
    bucketed = {
        tuple(r) for r in diff_tables(bsrc, btgt, ["o_orderkey"]).collect()
    }
    plain = {tuple(r) for r in diff_tables(src, tgt, ["o_orderkey"]).collect()}
    assert bucketed == plain and len(bucketed) > 0
