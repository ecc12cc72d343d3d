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


# --- quantile_buckets: the no-global-sort NTILE scale path ----------------


def test_quantile_buckets_matches_ntile_on_continuous_data(spark):
    """On continuous (all-distinct) data the approx path must agree
    with exact NTILE for effectively every row: near-equal bucket
    counts and >=99% row-level agreement (disagreement only within the
    sketch's relative error of a cut point)."""
    from pyspark.sql import Window

    from sqlserver_pg_cdc_spark.operators.quality import quantile_buckets

    rows = [(i, ((i * 2654435761) % 100003) / 7.0) for i in range(20000)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = quantile_buckets(df, "v", 4)
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    exact = df.withColumn("q", F.ntile(4).over(w))
    joined = got.join(exact, ["id", "v"])
    n = joined.count()
    agree = joined.filter(F.col("bucket") == F.col("q")).count()
    assert agree / n >= 0.99
    counts = {r["bucket"]: r["c"] for r in got.groupBy("bucket").count().withColumnRenamed("count", "c").collect()}
    assert set(counts) == {1, 2, 3, 4}
    for b, c in counts.items():
        assert abs(c - 5000) <= 100, (b, c)
    # buckets are monotonic in value: max of bucket b <= min of bucket b+1
    rng = {
        r["bucket"]: (r["lo"], r["hi"])
        for r in got.groupBy("bucket").agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()
    }
    for b in (1, 2, 3):
        assert rng[b][1] <= rng[b + 1][0]


def test_quantile_buckets_nulls_ties_and_degenerate(spark):
    from sqlserver_pg_cdc_spark.operators.quality import quantile_buckets

    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0), (4, None), (5, 9.0)], "id long, v double"
    )
    got = {r["id"]: r["bucket"] for r in quantile_buckets(df, "v", 2).collect()}
    assert got[4] is None  # NULL -> NULL bucket, never force-ranked
    assert got[1] == got[2] == got[3]  # heavy ties stay together
    assert got[5] > got[1]
    # all-NULL input: every bucket NULL, no crash
    nulls = spark.createDataFrame([(1, None), (2, None)], "id long, v double")
    assert [r["bucket"] for r in quantile_buckets(nulls, "v", 3).collect()] == [None, None]
    # n=1: everything in bucket 1
    one = quantile_buckets(df, "v", 1)
    assert {r["bucket"] for r in one.filter("v is not null").collect()} == {1}
    with pytest.raises(ValueError):
        quantile_buckets(df, "v", 0)


def test_quantile_buckets_plan_has_no_window_or_global_sort(spark):
    """The assignment scan must be windowless and sortless — the whole
    point vs exact NTILE's single-partition WindowExec."""
    from sqlserver_pg_cdc_spark.operators.quality import quantile_buckets

    df = spark.range(0, 10000).withColumn("v", (F.col("id") * 37 % 9973).cast("double"))
    plan = quantile_buckets(df, "v", 8)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Sort" not in plan
    assert "Exchange" not in plan  # no shuffle at all: aggregate ran at build time


def test_diversity_sample_covers_space_not_density(spark):
    """Cluster-balanced selection: a dominant dense cluster is capped
    at the quota while every sparse cell keeps all its members — the
    sample covers embedding SPACE, not corpus density. Deterministic
    across runs; assignment is a literal argmax (no shuffle before the
    single quota-cut exchange)."""
    from sqlserver_pg_cdc_spark.operators.sampling import diversity_sample

    def vec(seed, dim=8):
        return [float((seed * 31 + j * 7) % 13) - 6.0 for j in range(dim)]

    rows = []
    # ids 0..3 seed four deterministic centroids (first-n-by-id law)
    for i in range(4):
        rows.append((i, vec(i)))
    # a DENSE cluster: 40 near-copies of vec(1) under higher ids
    for i in range(100, 140):
        rows.append((i, vec(1)))
    # sparse tail: two lone members near vec(2) and vec(3)
    rows.append((200, vec(2)))
    rows.append((300, vec(3)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = diversity_sample(df, "vec_id", "embedding", quota=5, n_cells=4)
    got = {(r["vec_id"], r["cell_id"], r["rk"]) for r in out.collect()}
    by_cell = {}
    for vid, cell, rk in got:
        by_cell.setdefault(cell, []).append((rk, vid))
    # every cell capped at the quota; rk is 1..len within each cell
    for cell, members in by_cell.items():
        assert len(members) <= 5
        assert sorted(rk for rk, _ in members) == list(
            range(1, len(members) + 1)
        )
    # the dense vec(1) cell hit the cap; the sparse cells kept all
    # members (200's and 300's cells contribute their loners)
    dense_cell = [c for c, m in by_cell.items() if len(m) == 5]
    assert dense_cell, by_cell
    sampled_ids = {vid for vid, _, _ in got}
    assert {200, 300} <= sampled_ids
    # dense-cluster representation is quota, not 40
    assert len(sampled_ids & set(range(100, 140))) <= 5
    # deterministic: a second run returns the identical set
    again = {
        (r["vec_id"], r["cell_id"], r["rk"])
        for r in diversity_sample(
            df, "vec_id", "embedding", quota=5, n_cells=4
        ).collect()
    }
    assert again == got
    # NULL vectors drop out (no direction, no cell)
    with_null = df.union(
        spark.createDataFrame(
            [(999, None)], "vec_id long, embedding array<double>"
        )
    )
    out2 = diversity_sample(with_null, "vec_id", "embedding", quota=5, n_cells=4)
    assert 999 not in {r["vec_id"] for r in out2.collect()}


def test_diversity_sample_by_rate_is_windowless_and_quota_bounded(spark):
    """The hot-cell scale path: per-cell EXPECTED quotas via hash-rate
    thresholds — the executed plan must contain NO Window and NO Sort
    (skew-immunity is the point), the kept count per cell must track
    the quota (within Bernoulli noise), a cell smaller than the quota
    keeps everything (rate clamps at 1), and the sample is a pure
    function of the data."""
    from sqlserver_pg_cdc_spark.operators.sampling import (
        diversity_sample_by_rate,
    )

    def vec(seed, dim=8):
        return [float((seed * 31 + j * 7) % 13) - 6.0 for j in range(dim)]

    rows = [(i, vec(i)) for i in range(4)]  # centroid seeds
    rows += [(i, vec(1)) for i in range(100, 700)]  # hot cell: 600 rows
    rows += [(i, vec(2)) for i in range(1000, 1003)]  # small cell: 3 rows
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = diversity_sample_by_rate(
        df, "vec_id", "embedding", quota=50, n_cells=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Sort" not in plan, plan
    got = out.collect()
    by_cell = {}
    for r in got:
        by_cell.setdefault(r["cell_id"], set()).add(r["vec_id"])
    hot = [m for m in by_cell.values() if m & set(range(100, 700))]
    assert hot, by_cell
    # expected 50 of 600+1: Bernoulli noise band (p=50/601, n=601)
    assert 20 <= len(hot[0]) <= 90
    # the under-quota cell keeps ALL members (rate clamps at 1.0)
    small = [m for m in by_cell.values() if m & {1000, 1001, 1002}]
    assert small and {1000, 1001, 1002} <= small[0]
    # deterministic: identical second run
    again = {(r["vec_id"], r["cell_id"]) for r in diversity_sample_by_rate(
        df, "vec_id", "embedding", quota=50, n_cells=4
    ).collect()}
    assert again == {(r["vec_id"], r["cell_id"]) for r in got}
