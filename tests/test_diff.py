"""Row-level diff tests: MISSING/EXTRA/MODIFIED classification, comparison
semantics (NULL, float tolerance, whitespace), composite PKs, oracle parity."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.diff import diff_tables, diff_tables_sql
from tests.conftest import load


def _perturbed_orders(df):
    """Deterministic discrepancy injection on orders:
    - drop keys % 97 == 0          -> MISSING
    - add keys shifted by 10^9     -> EXTRA
    - bump totalprice % 89 == 0    -> MODIFIED (o_totalprice)
    - re-status keys % 83 == 0     -> MODIFIED (o_orderstatus)
    """
    base = df.filter(F.col("o_orderkey") % 97 != 0)
    extra = df.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(1_000_000_000)
    )
    mutated = base.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.5).otherwise(
            F.col("o_totalprice")
        ),
    ).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 83 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    return mutated.unionByName(extra)


def test_diff_classification(spark):
    src = load(spark, "orders")
    tgt = _perturbed_orders(src)
    d = diff_tables(src, tgt, ["o_orderkey"]).cache()

    missing = {r["o_orderkey"] for r in d.filter(F.col("diff_type") == "MISSING").collect()}
    extra = {r["o_orderkey"] for r in d.filter(F.col("diff_type") == "EXTRA").collect()}
    modified = {
        r["o_orderkey"]: r["modified_columns"]
        for r in d.filter(F.col("diff_type") == "MODIFIED").collect()
    }

    src_keys = {r[0] for r in src.select("o_orderkey").collect()}
    assert missing == {k for k in src_keys if k % 97 == 0}
    assert extra == {k + 1_000_000_000 for k in src_keys if k % 101 == 0}
    assert all(k % 89 == 0 or k % 83 == 0 for k in modified)
    for k, cols in modified.items():
        expect = []
        if k % 83 == 0:
            expect.append("o_orderstatus")
        if k % 89 == 0:
            expect.append("o_totalprice")
        assert cols == ",".join(expect)
    d.unpersist()


def test_diff_oracle_parity(spark, duck):
    src = load(spark, "orders")
    tgt = _perturbed_orders(src)
    got = sorted(
        tuple(r) for r in diff_tables(src, tgt, ["o_orderkey"]).collect()
    )
    target_sql = """
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 83 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.5 ELSE o_totalprice END AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 101 = 0
    """
    sql = diff_tables_sql(src, "SELECT * FROM orders", target_sql, ["o_orderkey"])
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == want


def test_diff_null_and_tolerance_semantics(spark):
    schema = "pk int, s string, f double"
    src = spark.createDataFrame(
        [
            (1, None, 1.0),          # NULL == NULL -> match
            (2, "a ", 2.0),          # trailing space -> match (trim)
            (3, "x", 3.0),           # f differs below tolerance -> match
            (4, "x", 4.0),           # f differs above tolerance -> MODIFIED
            (5, None, 5.0),          # NULL vs value -> MODIFIED
        ],
        schema,
    )
    tgt = spark.createDataFrame(
        [
            (1, None, 1.0),
            (2, "a", 2.0),
            (3, "x", 3.0 + 1e-12),
            (4, "x", 4.0 + 1e-6),
            (5, "set", 5.0),
        ],
        schema,
    )
    d = {r["pk"]: (r["diff_type"], r["modified_columns"])
         for r in diff_tables(src, tgt, ["pk"]).collect()}
    assert set(d) == {4, 5}
    assert d[4] == ("MODIFIED", "f")
    assert d[5] == ("MODIFIED", "s")


def test_diff_composite_pk(spark):
    # the synthetic lineitem has duplicate (orderkey, linenumber) pairs;
    # diff requires unique PKs, so dedup first
    src = load(spark, "lineitem").dropDuplicates(["l_orderkey", "l_linenumber"])
    pk = ["l_orderkey", "l_linenumber"]
    tgt = src.withColumn(
        "l_quantity",
        F.when(
            (F.col("l_orderkey") % 7 == 0) & (F.col("l_linenumber") == 1),
            F.col("l_quantity") + 1,
        ).otherwise(F.col("l_quantity")),
    )
    d = diff_tables(src, tgt, pk).collect()
    assert len(d) > 0
    assert all(r["diff_type"] == "MODIFIED" and r["modified_columns"] == "l_quantity" for r in d)


def test_diff_identical_tables_empty(spark):
    src = load(spark, "customer")
    assert diff_tables(src, src, ["c_custkey"]).count() == 0


def test_as_of_join_semantics(spark):
    """Point-in-time lookup: latest right row with ts <= left ts per key;
    equal timestamps visible; no prior row -> NULLs."""
    from sqlserver_pg_cdc_spark.operators.temporal import as_of_join

    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (1, 5, "e0"), (2, 50, "e3")],
        "k long, ts long, ev string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 15, "r15"), (2, 60, "r60")],
        "k long, ts long, val string",
    )
    got = {
        r["ev"]: r["val"]
        for r in as_of_join(left, right, ["k"], "ts", "ts",
                            right_value_cols=["val"]).collect()
    }
    assert got == {
        "e0": None,     # nothing at or before ts=5
        "e1": "r10",    # equal ts is visible
        "e2": "r15",    # latest of {10, 15}
        "e3": None,     # right row is after the left ts
    }


def test_binned_range_join_matches_broadcast(spark):
    from sqlserver_pg_cdc_spark.operators.temporal import binned_range_join, range_join

    li = load(spark, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    tiers = spark.createDataFrame(
        [("a", 0.0, 20.0), ("b", 20.5, 40.0), ("c", 40.5, 100.0)],
        "tier string, lo double, hi double",
    )
    plain = range_join(li, tiers, "l_quantity", "lo", "hi").groupBy("tier").count()
    binned = binned_range_join(li, tiers, "l_quantity", "lo", "hi", bin_width=7.0) \
        .groupBy("tier").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, binned.collect()))


def test_incremental_diff_equals_full_diff(spark):
    from sqlserver_pg_cdc_spark.operators.diff import diff_tables, incremental_diff
    from sqlserver_pg_cdc_spark.sources.parquet import load_table

    src = load_table(spark, "/root/testdata/sf0.001", "orders")
    tgt = src.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice")),
    )
    full = {tuple(r) for r in diff_tables(src, tgt, ["o_orderkey"]).collect()}
    inc = {
        tuple(r)
        for r in incremental_diff(src, tgt, ["o_orderkey"], n_buckets=32).collect()
    }
    assert inc == full and len(inc) > 0


def test_incremental_diff_identical_tables_is_empty(spark):
    from sqlserver_pg_cdc_spark.operators.diff import incremental_diff
    from sqlserver_pg_cdc_spark.sources.parquet import load_table

    src = load_table(spark, "/root/testdata/sf0.001", "orders")
    assert incremental_diff(src, src, ["o_orderkey"], n_buckets=32).count() == 0


def test_snapshot_changes_roundtrip(spark):
    """The generated change feed, applied to the old snapshot, must
    reproduce the new snapshot exactly."""
    from sqlserver_pg_cdc_spark.operators.diff import snapshot_changes

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id long, s string, v double"
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.5), (4, "d", 4.0)], "id long, s string, v double"
    )
    feed = {r["id"]: r for r in snapshot_changes(old, new, ["id"]).collect()}
    assert set(feed) == {2, 3, 4}  # id 1 unchanged -> no event
    assert feed[2]["op"] == "u" and feed[2]["s"] == "B" and feed[2]["v"] == 2.5
    assert feed[3]["op"] == "d" and feed[3]["s"] == "c"  # before image
    assert feed[4]["op"] == "c" and feed[4]["s"] == "d"

    # replay the feed over `old` imperatively
    state = {r["id"]: (r["s"], r["v"]) for r in old.collect()}
    for rid, r in feed.items():
        if r["op"] == "d":
            del state[rid]
        else:
            state[rid] = (r["s"], r["v"])
    want = {r["id"]: (r["s"], r["v"]) for r in new.collect()}
    assert state == want
