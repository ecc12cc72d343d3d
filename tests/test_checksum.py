"""Checksum operator tests: oracle parity, order-insensitivity,
determinism, incremental composition, empty input."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.checksum import (
    incremental_checksum,
    ordered_checksum,
    table_checksum,
    table_checksum_sql,
)
from tests.conftest import load


@pytest.mark.parametrize("mode", ["commutative", "sorted"])
@pytest.mark.parametrize("table", ["customer", "orders", "lineitem"])
def test_checksum_oracle_parity(spark, duck, table, mode):
    df = load(spark, table)
    got = table_checksum(df, mode=mode).collect()[0]
    want = duck.execute(table_checksum_sql(df, table, mode=mode)).fetchone()
    assert (got["checksum"], got["row_count"]) == want


def test_checksum_order_insensitive(spark):
    df = load(spark, "customer")
    a = table_checksum(df).collect()[0]
    b = table_checksum(df.orderBy(F.col("c_acctbal").desc())).collect()[0]
    assert a == b


def test_checksum_detects_single_value_change(spark):
    df = load(spark, "customer")
    mutated = df.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") == 1, F.col("c_acctbal") + 0.01).otherwise(
            F.col("c_acctbal")
        ),
    )
    assert (
        table_checksum(df).collect()[0]["checksum"]
        != table_checksum(mutated).collect()[0]["checksum"]
    )


def test_checksum_empty_input_parity(spark, duck):
    df = load(spark, "customer").filter(F.lit(False))
    for mode in ("commutative", "sorted"):
        got = table_checksum(df, mode=mode).collect()[0]
        want = duck.execute(
            table_checksum_sql(df, "customer", mode=mode, where="1=0")
        ).fetchone()
        assert (got["checksum"], got["row_count"]) == want
        assert got["row_count"] == 0


def test_incremental_checksum_matches_filtered_full(spark):
    df = load(spark, "events")
    since = "2024-01-15 00:00:00"
    inc = incremental_checksum(df, "ts", since).collect()[0]
    full_on_delta = table_checksum(df.filter(F.col("ts") > since)).collect()[0]
    assert inc == full_on_delta
    assert 0 < inc["row_count"] < df.count()


def test_ordered_checksum_is_order_sensitive(spark):
    df = load(spark, "region")
    fwd = ordered_checksum(df, ["r_regionkey"])
    rev = ordered_checksum(df.withColumn("neg", -F.col("r_regionkey")), ["neg"],
                           cols=["r_regionkey", "r_name"])
    assert fwd != rev
    # deterministic across invocations
    assert fwd == ordered_checksum(df, ["r_regionkey"])


def test_checksum_fast_mode_properties(spark):
    """xxhash64 fast mode: deterministic, permutation-invariant,
    change-sensitive (no oracle — no cross-engine xxhash64 twin)."""
    df = load(spark, "customer")
    a = table_checksum(df, mode="fast").collect()[0]
    b = table_checksum(df.orderBy(F.col("c_name").desc()), mode="fast").collect()[0]
    assert a == b and a["row_count"] == df.count()
    mutated = df.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") == 3, F.col("c_acctbal") + 0.01).otherwise(
            F.col("c_acctbal")
        ),
    )
    assert table_checksum(mutated, mode="fast").collect()[0]["checksum"] != a["checksum"]


def test_ordered_checksum_df_equals_serial_fold(spark):
    """The flat distributed sha2(ordered concat) form must equal the
    serial hashlib fold (they are mathematically the same digest)."""
    from sqlserver_pg_cdc_spark.operators.checksum import ordered_checksum_df

    df = load(spark, "nation")
    serial = ordered_checksum(df, ["n_nationkey"])
    dist = ordered_checksum_df(df, ["n_nationkey"], bucket_width=None).collect()[0]
    assert dist["checksum"] == serial
    assert dist["row_count"] == df.count()


def test_bucketed_ordered_checksum_properties(spark):
    """The hierarchical (bucketed) A2 digest: partition-layout invariant,
    order-sensitive, change-sensitive — without any all-rows collect."""
    from sqlserver_pg_cdc_spark.operators.checksum import ordered_checksum_df

    df = load(spark, "orders")
    width = 1000  # force many buckets at fixture scale
    base = ordered_checksum_df(df, ["o_orderkey"], bucket_width=width).collect()[0]
    assert base["row_count"] == df.count()

    # invariant under repartitioning (the digest depends on key order only)
    shuffled = ordered_checksum_df(
        df.repartition(13), ["o_orderkey"], bucket_width=width
    ).collect()[0]
    assert shuffled["checksum"] == base["checksum"]

    # a single mutated value flips the digest
    mutated = df.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == 7, F.col("o_totalprice") + 0.01).otherwise(
            F.col("o_totalprice")
        ),
    )
    assert (
        ordered_checksum_df(mutated, ["o_orderkey"], bucket_width=width)
        .collect()[0]["checksum"]
        != base["checksum"]
    )

    # moving a row between positions (key swap) flips it too, even though
    # the multiset of row payloads is unchanged except for the key column
    swapped = df.withColumn(
        "o_orderkey",
        F.when(F.col("o_orderkey") == 1, F.lit(999_999))
        .when(F.col("o_orderkey") == 999_999, F.lit(1))
        .otherwise(F.col("o_orderkey")),
    )
    assert (
        ordered_checksum_df(swapped, ["o_orderkey"], bucket_width=width)
        .collect()[0]["checksum"]
        != base["checksum"]
    )


def test_bucketed_ordered_checksum_plan_has_no_global_collect(spark):
    """Scale guard: the bucketed fold's per-row collect_list must sit
    under a groupBy (hash partitioning on __bkt), so no single task ever
    aggregates every row — the final fold only sees bucket digests."""
    from sqlserver_pg_cdc_spark.operators.checksum import ordered_checksum_df

    df = load(spark, "orders")
    plan = ordered_checksum_df(df, ["o_orderkey"])._jdf.queryExecution().executedPlan().toString()
    # the first (per-row) aggregate must be keyed by __bkt, i.e. the
    # row-level collect happens inside a hash-partitioned exchange
    assert "__bkt" in plan
    assert "hashpartitioning(__bkt" in plan


def test_approx_count_distinct_within_tolerance(spark):
    """S8: the approximate-aggregate family — approx_count_distinct must
    land within its documented rsd of the exact count (no cross-engine
    oracle: HLL implementations differ)."""
    li = load(spark, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.06  # 3x rsd
