"""Count-min sketch laws: overestimation, merge associativity, parity
between split-build-merge and one-shot build, absent-item behavior."""

import pyspark.sql.functions as F

from sqlserver_pg_cdc_spark.operators import cms


def _occ(spark, items):
    return spark.createDataFrame([(x,) for x in items], "tok string")


def test_estimate_never_underestimates(spark):
    items = ["a"] * 50 + ["b"] * 20 + ["c"] * 3 + [f"x{i}" for i in range(300)]
    occ = _occ(spark, items)
    sketch = cms.cms_build(occ, "tok").persist()
    exact = occ.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    est = cms.cms_estimate(exact, sketch, "tok")
    for r in est.collect():
        assert r["cms_est"] >= r["exact_cnt"], r
    sketch.unpersist()


def test_split_build_merge_equals_one_shot(spark):
    items = [f"t{i % 37}" for i in range(500)]
    occ = _occ(spark, items)
    one = cms.cms_build(occ, "tok")
    # split deterministically by hash (limit would be unordered)
    h = F.pmod(F.xxhash64("tok"), F.lit(2))
    parts = [occ.filter(h == i) for i in (0, 1)]
    # NOTE per-row multiplicity matters: filter splits occurrences exactly
    merged = cms.cms_merge([cms.cms_build(p, "tok") for p in parts])
    a = {(r["row"], r["cell"]): r["cnt"] for r in one.collect()}
    b = {(r["row"], r["cell"]): r["cnt"] for r in merged.collect()}
    assert a == b


def test_absent_item_estimates_low_or_zero(spark):
    occ = _occ(spark, [f"w{i}" for i in range(100)])
    sketch = cms.cms_build(occ, "tok").persist()
    ghosts = spark.createDataFrame([("never-seen-token",)], "tok string")
    (r,) = cms.cms_estimate(ghosts, sketch, "tok").collect()
    # 4 independent cells over 1024 counters with 100 increments: the
    # min is overwhelmingly 0; assert the sound bound (<= total mass)
    assert 0 <= r["cms_est"] <= 100
    sketch.unpersist()


def test_sql_twin_matches_spark_bits(spark, duck):
    """The md5-derived cell family must produce IDENTICAL sketches on
    both engines (the bloom_prefilter discipline)."""
    items = [f"tok{i % 11}" for i in range(200)]
    occ = _occ(spark, items)
    spark_cells = {
        (r["row"], r["cell"]): r["cnt"]
        for r in cms.cms_build(occ, "tok").collect()
    }
    vals = ", ".join(f"('tok{i % 11}')" for i in range(200))
    sql = cms.cms_build_sql(f"SELECT * FROM (VALUES {vals}) v(tok)", "tok")
    duck_cells = {(r[0], r[1]): r[2] for r in duck.execute(sql).fetchall()}
    assert spark_cells == duck_cells


def test_cms_sink_stream_equals_one_shot(spark, tmp_path):
    """Streamed batches through the CmsSink must produce the IDENTICAL
    sketch as a one-shot build over everything — and the state stays
    bounded at d*w cells however much data flows through."""
    import json as J
    import os

    from sqlserver_pg_cdc_spark.streaming.rollup import CmsSink

    items = [f"t{i % 23}" for i in range(400)]
    spool = tmp_path / "spool"
    os.makedirs(spool)
    for fname, chunk in (("a.json", items[:150]), ("b.json", items[150:])):
        with open(spool / fname, "w") as f:
            for tok in chunk:
                f.write(J.dumps({"tok": tok}) + "\n")
    sink = CmsSink(spark, str(tmp_path / "state"), "tok")
    q = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .json(str(spool))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    occ = _occ(spark, items)
    want = {(r["row"], r["cell"]): r["cnt"] for r in cms.cms_build(occ, "tok").collect()}
    got = {(r["row"], r["cell"]): r["cnt"] for r in sink.read_target().collect()}
    assert got == want
    assert len(got) <= 4 * 1024
    # point queries against the streamed state match exact counts
    exact = occ.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    est = sink.estimate(exact)
    for r in est.collect():
        assert r["cms_est"] >= r["exact_cnt"]


def test_cms_sink_idempotent_replay(spark, tmp_path):
    """With idempotent=True a foreachBatch redelivery (crash post-swap,
    pre-checkpoint-commit) is skipped: the replayed batch must not
    double-count into the additive sketch, and the batch-id bookkeeping
    column must never leak into read_target()/estimate() output."""
    from sqlserver_pg_cdc_spark.streaming.rollup import CmsSink

    items = [f"t{i % 11}" for i in range(300)]
    occ = _occ(spark, items)
    b0 = _occ(spark, items[:120])
    b1 = _occ(spark, items[120:])
    sink = CmsSink(spark, str(tmp_path / "state"), "tok", idempotent=True)
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # at-least-once redelivery: must be a no-op
    want = {(r["row"], r["cell"]): r["cnt"] for r in cms.cms_build(occ, "tok").collect()}
    got_df = sink.read_target()
    assert "__bid" not in got_df.columns
    got = {(r["row"], r["cell"]): r["cnt"] for r in got_df.collect()}
    assert got == want
    exact = occ.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    for r in sink.estimate(exact).collect():
        assert r["cms_est"] >= r["exact_cnt"]
