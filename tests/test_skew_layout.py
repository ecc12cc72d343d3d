"""Skew salting and physical layout (bucketing/partitioning) tests."""

import os

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_join,
    with_salt,
)
from sqlserver_pg_cdc_spark.plans.advisor import analyze_plan, formatted_plan
from sqlserver_pg_cdc_spark.sources.layout import (
    read_table,
    write_bucketed,
    write_partitioned,
)
from tests.conftest import load


def test_salted_aggregate_matches_plain(spark):
    orders = load(spark, "orders")
    plain = {
        r["o_custkey"]: (r["cnt"], r["total"])
        for r in orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        )
        .collect()
    }
    salted = {
        r["o_custkey"]: (r["cnt"], r["total"])
        for r in salted_aggregate(
            orders,
            ["o_custkey"],
            partial_aggs={
                "cnt": F.count(F.lit(1)),
                "total": F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
            },
            merge_aggs={"cnt": F.sum("cnt"), "total": F.sum("total")},
        ).collect()
    }
    assert salted == plain


def test_salted_broadcast_join_matches_plain(spark):
    orders = load(spark, "orders")
    cust = load(spark, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(cust, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_broadcast_join(orders, cust, ["o_custkey"]).groupBy(
        "c_mktsegment"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_with_salt_range(spark):
    df = with_salt(load(spark, "customer"), 8)
    vals = {r["__salt"] for r in df.select("__salt").distinct().collect()}
    assert vals <= set(range(8)) and len(vals) > 1


def test_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "orders_part")
    write_partitioned(load(spark, "orders"), path, ["o_orderstatus"])
    # partition dirs exist
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(path))
    back = spark.read.parquet(path)
    filtered = back.filter(F.col("o_orderstatus") == "O")
    plan = formatted_plan(filtered)
    # partition filter reaches the scan (pruning, not a data filter)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    assert filtered.count() == load(spark, "orders").filter(F.col("o_orderstatus") == "O").count()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """The co-located join: two tables bucketed on the key join with zero
    Exchange nodes — the scale property bucketing exists for."""
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    orders = load(spark, "orders")
    cust = load(spark, "customer")
    write_bucketed(orders, "bktest.orders_b", ["o_custkey"], num_buckets=8)
    write_bucketed(
        cust.select(F.col("c_custkey").alias("o_custkey"), "c_acctbal"),
        "bktest.cust_b",
        ["o_custkey"],
        num_buckets=8,
    )
    joined = read_table(spark, "bktest.orders_b").join(
        read_table(spark, "bktest.cust_b").hint("merge"), "o_custkey"
    )
    m = analyze_plan(joined)
    assert m.exchanges == 0, f"bucketed join still shuffles: {m.exchanges} exchanges"
    assert joined.count() > 0
