"""Continuous-aggregate maintenance: state build/merge/finalize laws —
any batch split finalizes identically to the one-shot aggregate, merge
is associative/commutative, retractions subtract, and a delta refresh
only rescans the delta."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators import continuous_agg as CA

KEYS = ["k"]


@pytest.fixture(scope="module")
def frame(spark):
    rows = [(i % 4, float(i) / 8.0 - 3.0) for i in range(200)]
    return spark.createDataFrame(rows, "k int, value double")


def _final(df):
    return {tuple(r)[:1]: tuple(r)[1:] for r in df.collect()}


def test_split_equals_one_shot(spark, frame):
    one_shot = _final(CA.finalize(CA.build_state(frame, KEYS, "value"), KEYS))
    parts = [frame.filter(F.col("value") < -1.0), frame.filter(F.col("value") >= -1.0)]
    states = [CA.build_state(p, KEYS, "value") for p in parts]
    merged = _final(CA.finalize(CA.merge_states(states, KEYS), KEYS))
    assert merged == one_shot


def test_merge_associative_commutative(spark, frame):
    a = CA.build_state(frame.filter("value < -2"), KEYS, "value")
    b = CA.build_state(frame.filter("value >= -2 and value < 0"), KEYS, "value")
    c = CA.build_state(frame.filter("value >= 0"), KEYS, "value")
    left = _final(CA.finalize(CA.merge_states([CA.merge_states([a, b], KEYS), c], KEYS), KEYS))
    right = _final(CA.finalize(CA.merge_states([a, CA.merge_states([c, b], KEYS)], KEYS), KEYS))
    assert left == right


def test_sum_retraction(spark):
    base = spark.createDataFrame([(1, 10.0), (1, 5.0)], "k int, value double")
    state = CA.build_state(base, KEYS, "value")
    # retract the 5.0 row: negative value with count -1 (sum/count only)
    retract = CA.build_state(
        spark.createDataFrame([(1, -5.0)], "k int, value double"), KEYS, "value"
    ).withColumn("__n", F.lit(-1).cast("long"))
    out = CA.finalize(CA.merge_states([state, retract], KEYS), KEYS).collect()[0]
    assert out["n_events"] == 1 and out["total"] == 10.0


def test_new_group_appears_via_merge(spark, frame):
    state = CA.build_state(frame, KEYS, "value")
    delta = CA.build_state(
        spark.createDataFrame([(99, 1.5)], "k int, value double"), KEYS, "value"
    )
    out = _final(CA.finalize(CA.merge_states([state, delta], KEYS), KEYS))
    assert (99,) in out and out[(99,)][0] == 1
    # pre-existing groups untouched
    assert out[(0,)] == _final(CA.finalize(state, KEYS))[(0,)]


# --- streaming sink -------------------------------------------------------


def test_rollup_sink_matches_one_shot(spark, frame, tmp_path):
    from sqlserver_pg_cdc_spark.streaming.rollup import ContinuousAggSink

    sink = ContinuousAggSink(spark, str(tmp_path / "state"), KEYS, "value")
    batches = [
        frame.filter("value < -2"),
        frame.filter("value >= -2 and value < 1"),
        frame.filter("value >= 1"),
    ]
    for i, b in enumerate(batches):
        sink(b, i)
    got = _final(sink.result())
    want = _final(CA.finalize(CA.build_state(frame, KEYS, "value"), KEYS))
    assert got == want


def test_rollup_sink_idempotent_replay(spark, frame, tmp_path):
    from sqlserver_pg_cdc_spark.streaming.rollup import ContinuousAggSink

    sink = ContinuousAggSink(
        spark, str(tmp_path / "state"), KEYS, "value", idempotent=True
    )
    b0 = frame.filter("value < 0")
    b1 = frame.filter("value >= 0")
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # at-least-once redelivery: must not double count
    got = _final(sink.result())
    want = _final(CA.finalize(CA.build_state(frame, KEYS, "value"), KEYS))
    assert got == want


def test_rollup_sink_crash_recovery(spark, frame, tmp_path):
    """Simulate a crash between the two swap renames: the state dir is
    gone but an __old_ generation exists — the next batch must recover
    it rather than restart from empty."""
    import os

    from sqlserver_pg_cdc_spark.streaming.rollup import ContinuousAggSink

    state = str(tmp_path / "state")
    sink = ContinuousAggSink(spark, state, KEYS, "value")
    sink(frame.filter("value < 0"), 0)
    os.rename(state, f"{state}__old_deadbeef")  # crash window
    sink(frame.filter("value >= 0"), 1)
    got = _final(sink.result())
    want = _final(CA.finalize(CA.build_state(frame, KEYS, "value"), KEYS))
    assert got == want


# --- mergeable HLL distinct state ----------------------------------------


def test_hll_state_split_equals_one_shot(spark):
    """Datasketches HLL union is lossless: any batch split of the input
    estimates identically to the one-shot sketch — the property that
    makes approx-distinct incrementally maintainable."""
    rows = [(i % 3, float(i), i % 37) for i in range(500)]
    d = spark.createDataFrame(rows, "k int, value double, uid int")
    one = CA.finalize(CA.build_state(d, KEYS, "value", distinct_col="uid"), KEYS)
    one_m = {r["k"]: r["n_distinct_approx"] for r in one.collect()}
    parts = [d.filter("value < 200"), d.filter("value >= 200")]
    states = [CA.build_state(p, KEYS, "value", distinct_col="uid") for p in parts]
    merged = CA.finalize(CA.merge_states(states, KEYS), KEYS)
    merged_m = {r["k"]: r["n_distinct_approx"] for r in merged.collect()}
    assert merged_m == one_m
    # at this cardinality the sketch is exact-mode: estimates are exact
    assert all(v == 37 for v in one_m.values())
