"""Data-quality checks, profiling, deterministic sampling."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.quality import (
    check_not_null,
    check_range,
    check_referential,
    check_unique,
    profile_table,
    run_checks,
)
from sqlserver_pg_cdc_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)
from tests.conftest import load


def test_checks_detect_injected_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", -1.0), (2, None, 3.0)],  # dup pk, null, range
        "id int, name string, score double",
    )
    parent = spark.createDataFrame([(1,)], "id int")
    report = {
        (r["check_name"], r["column_name"]): (r["violations"], r["passed"])
        for r in run_checks(
            [
                check_unique(df, ["id"]),
                check_not_null(df, "name"),
                check_range(df, "score", 0.0, 10.0),
                check_referential(df, parent, ["id"], ["id"]),
            ]
        ).collect()
    }
    assert report[("unique", "id")] == (1, False)
    assert report[("not_null", "name")] == (1, False)
    assert report[("range", "score")] == (1, False)
    assert report[("referential", "id")] == (1, False)  # id=2 orphaned


def test_checks_pass_on_clean_data(spark):
    cust = load(spark, "customer")
    rows = run_checks(
        [check_unique(cust, ["c_custkey"]), check_not_null(cust, "c_name")]
    ).collect()
    assert all(r["passed"] for r in rows)


def test_quality_finds_real_lineitem_duplicates(spark):
    """The synthetic lineitem genuinely has duplicate composite keys —
    the uniqueness check must report them, not paper over them."""
    li = load(spark, "lineitem")
    [r] = check_unique(li, ["l_orderkey", "l_linenumber"]).collect()
    assert r["passed"] is False and r["violations"] > 0


def test_profile_table_shape(spark):
    prof = {r["column_name"]: r for r in profile_table(load(spark, "region")).collect()}
    assert set(prof) == {"r_regionkey", "r_name"}
    assert prof["r_regionkey"]["n_nulls"] == 0
    assert prof["r_regionkey"]["n_distinct"] == 5
    assert prof["r_regionkey"]["min_canon"] == "0"
    assert prof["r_regionkey"]["max_canon"] == "4"


def test_deterministic_sample_is_stable_and_sized(spark):
    ev = load(spark, "events")
    s1 = deterministic_sample(ev, "event_id", 0.1)
    s2 = deterministic_sample(ev.repartition(13), "event_id", 0.1)
    ids1 = sorted(r["event_id"] for r in s1.select("event_id").collect())
    ids2 = sorted(r["event_id"] for r in s2.select("event_id").collect())
    assert ids1 == ids2  # partitioning-independent
    n = ev.count()
    assert 0.05 * n < len(ids1) < 0.15 * n  # ~10%

    # disjoint split property: 10% and the next 10% band don't overlap
    s_rest = deterministic_sample(ev, "event_id", 0.2).exceptAll(s1)
    assert s_rest.join(s1, "event_id", "left_semi").count() == 0


def test_stratified_sample_caps_per_stratum(spark):
    o = load(spark, "orders").select("o_orderkey", "o_orderstatus")
    s = stratified_sample(o, ["o_orderstatus"], "o_orderkey", 7)
    counts = {r["o_orderstatus"]: r["n"] for r in
              s.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(v <= 7 for v in counts.values())
    assert set(counts) == {r[0] for r in o.select("o_orderstatus").distinct().collect()}
    # deterministic across invocations
    a = sorted(r["o_orderkey"] for r in s.collect())
    b = sorted(r["o_orderkey"] for r in stratified_sample(o, ["o_orderstatus"], "o_orderkey", 7).collect())
    assert a == b


def test_weighted_sample_semantics(spark):
    """weight=0 never samples, weight=1 equals the plain deterministic
    sample, and keep-rate grows with weight; decisions are a pure
    function of the key so re-runs are identical."""
    from sqlserver_pg_cdc_spark.operators.sampling import (
        deterministic_sample,
        weighted_sample,
    )

    df = load(spark, "orders").select("o_orderkey")
    zero = df.withColumn("w", F.lit(0.0))
    one = df.withColumn("w", F.lit(1.0))
    assert weighted_sample(zero, "o_orderkey", "w", 0.5).count() == 0
    assert (
        weighted_sample(one, "o_orderkey", "w", 0.3).count()
        == deterministic_sample(df, "o_orderkey", 0.3).count()
    )
    lo = weighted_sample(
        df.withColumn("w", F.lit(0.2)), "o_orderkey", "w", 0.5
    ).count()
    hi = weighted_sample(
        df.withColumn("w", F.lit(0.8)), "o_orderkey", "w", 0.5
    ).count()
    n = df.count()
    assert 0 < lo < hi < n
    # out-of-range weights clamp instead of exploding the probability
    clamped = weighted_sample(
        df.withColumn("w", F.lit(7.5)), "o_orderkey", "w", 0.3
    ).count()
    assert clamped == deterministic_sample(df, "o_orderkey", 0.3).count()
    # deterministic: second run identical
    assert lo == weighted_sample(
        df.withColumn("w", F.lit(0.2)), "o_orderkey", "w", 0.5
    ).count()


def test_budget_mix_respects_budgets_and_determinism(spark):
    from sqlserver_pg_cdc_spark.operators.sampling import budget_mix

    d = load(spark, "documents")
    budgets = {f"src{i}": 1500 for i in range(20)}
    out = budget_mix(d, "source", "doc_id", "n_chars", budgets)
    per_src = {
        r["source"]: r["tok"]
        for r in out.groupBy("source")
        .agg(F.max("cum_tokens").alias("tok"))
        .collect()
    }
    assert per_src, "mixture selected nothing"
    assert all(v <= 1500 for v in per_src.values())
    # greedy fill: adding the NEXT doc in hash order would exceed budget,
    # so kept-token totals are reproducible run to run
    again = budget_mix(d, "source", "doc_id", "n_chars", budgets)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_budget_mix_by_rate_expected_tokens(spark):
    from sqlserver_pg_cdc_spark.operators.sampling import budget_mix_by_rate

    d = load(spark, "documents")
    totals = {
        r["source"]: r["t"]
        for r in d.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()
    }
    # half of each source's tokens as budget -> keep rate ~0.5
    budgets = {s: int(t // 2) for s, t in totals.items()}
    out = budget_mix_by_rate(d, "source", "doc_id", "n_chars", budgets)
    kept = {
        r["source"]: r["t"]
        for r in out.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()
    }
    # expected-value sampling: aggregate corpus-level tokens near 50%
    total_all = sum(totals.values())
    kept_all = sum(kept.values())
    assert 0.3 * total_all < kept_all < 0.7 * total_all
    # budget >= total -> rate clamps to 1, everything kept
    everything = budget_mix_by_rate(
        d, "source", "doc_id", "n_chars", {s: t * 2 for s, t in totals.items()}
    )
    assert everything.count() == d.count()


def test_outliers_zscore_semantics(spark):
    """Planted outlier: 20 tight values + one far point per group —
    only the far point flags, and its z-score matches the moments."""
    from sqlserver_pg_cdc_spark.operators.quality import outliers_zscore

    rows = [("g", float(100 + (i % 5))) for i in range(20)] + [("g", 500.0)]
    rows += [("h", 10.0), ("h", 10.0), ("h", 10.0)]  # zero-variance group
    df = spark.createDataFrame(rows, "k string, v double")
    out = outliers_zscore(df, ["k"], "v", z=3.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["k"] == "g" and r["v"] == 500.0 and r["zscore"] > 3.0
    # zero-variance group flags nothing (sd == 0)
    assert not [x for x in out if x["k"] == "h"]
