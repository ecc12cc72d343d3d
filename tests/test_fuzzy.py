"""Deletion-neighborhood fuzzy join: the blocked equi-join must find
EXACTLY the pairs a brute-force cross join finds at Levenshtein <= 1 —
sound (verify filter) and complete (pigeonhole over delete variants) —
across substitution, insertion, deletion, and exact-match cases."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.fuzzy import fuzzy_join_typo

NAMES_A = [
    (1, "smith"),
    (2, "jones"),
    (3, "brown"),
    (4, "x"),
    (5, ""),
]
NAMES_B = [
    (11, "smith"),   # exact (dist 0)
    (12, "smyth"),   # substitution
    (13, "smiths"),  # insertion
    (14, "smit"),    # deletion
    (15, "jnoes"),   # transposition = distance 2 -> must NOT match
    (16, "browne"),  # insertion
    (17, "zz"),      # no match
    (18, ""),        # exact-empty (dist 0 vs id 5), dist 1 vs "x"
]


@pytest.fixture(scope="module")
def sides(spark):
    a = spark.createDataFrame(NAMES_A, "id long, name string")
    b = spark.createDataFrame(NAMES_B, "id long, name string")
    return a, b


def test_blocked_equals_brute_force(spark, sides):
    a, b = sides
    got = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in fuzzy_join_typo(a, b, "id", "id", "name").collect()
    }
    brute = (
        a.select(F.col("id").alias("a_id"), F.col("name").alias("a_val"))
        .crossJoin(
            b.select(F.col("id").alias("b_id"), F.col("name").alias("b_val"))
        )
        .withColumn("dist", F.levenshtein("a_val", "b_val").cast("long"))
        .filter(F.col("dist") <= 1)
    )
    want = {(r["a_id"], r["b_id"], r["dist"]) for r in brute.collect()}
    assert got == want
    # the planted relationships, spelled out
    assert (1, 11, 0) in got and (1, 12, 1) in got
    assert (1, 13, 1) in got and (1, 14, 1) in got
    assert (3, 16, 1) in got
    assert (5, 18, 0) in got and (4, 18, 1) in got
    assert not any(bid == 15 for _, bid, _ in got)  # distance-2 excluded
    assert not any(bid == 17 for _, bid, _ in got)


def test_fuzzy_join_unicode_names_codepoint_semantics(spark):
    """The documented contract: the SPARK side operates on Unicode
    CODEPOINTS (substring/length/levenshtein are codepoint-based), so
    non-ASCII names behave like any other string — a one-codepoint typo
    in a multi-byte name is found at dist 1, and identical non-ASCII
    names match at dist 0. (The DuckDB oracle twin counts BYTES, which
    is why the cross-engine contract queries run on ASCII columns only
    — see the module docstring; this test pins the Spark-side
    semantics that non-ASCII deployments get.)"""
    from sqlserver_pg_cdc_spark.operators.fuzzy import fuzzy_join_typo

    a = spark.createDataFrame(
        [(1, "Grüße"), (2, "日本語"), (3, "café")], "id long, name string"
    )
    b = spark.createDataFrame(
        [(10, "Grüß"),    # one codepoint deleted
         (20, "日本語"),   # identical
         (30, "cafe")],   # é -> e substitution: ONE codepoint edit
        "id long, name string",
    )
    got = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in fuzzy_join_typo(a, b, "id", "id", "name").collect()
    }
    assert got[(1, 10)] == 1
    assert got[(2, 20)] == 0
    assert got[(3, 30)] == 1  # byte-counting engines would say 2
