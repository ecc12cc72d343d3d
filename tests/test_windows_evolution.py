"""Streaming windowed aggregation, stateful operator, schema evolution."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlserver_pg_cdc_spark.operators.evolution import (
    align_to_evolved,
    diff_schemas,
    evolve_union,
)
from sqlserver_pg_cdc_spark.streaming.windows import (
    running_totals_stateful,
    sessionize,
    windowed_event_counts,
)
from tests.conftest import load


# --- windows (batch + streaming share the code path) ----------------------

def test_windowed_counts_batch_matches_manual(spark):
    ev = load(spark, "events")
    w = windowed_event_counts(ev, window_len="1 day")
    manual = (
        ev.groupBy(F.date_trunc("day", "ts").alias("d"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r["window_start"], r["event_type"]): r["n_events"] for r in w.collect()}
    want = {(r["d"], r["event_type"]): r["n"] for r in manual.collect()}
    assert got == want


def test_windowed_counts_streaming_with_watermark(spark, tmp_path):
    """Same operator over readStream: availableNow drain, complete parity
    with the batch result."""
    ev = load(spark, "events").limit(500)
    src_dir, out = str(tmp_path / "src"), str(tmp_path / "out")
    ev.write.json(src_dir)
    schema = ev.schema
    stream = spark.readStream.schema(schema).json(src_dir)
    q = (
        windowed_event_counts(stream, window_len="1 day", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_test").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in windowed_event_counts(ev, window_len="1 day").collect()
    }
    assert got == want


def test_sessionize_batch(spark):
    ev = load(spark, "events")
    s = sessionize(ev, gap="30 minutes")
    rows = s.collect()
    assert len(rows) > 0
    assert all(r["session_end"] > r["session_start"] for r in rows)
    # per-key session event counts sum to the key's total events
    totals = {r["user_id"]: r["n"] for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    by_user = {}
    for r in rows:
        by_user[r["user_id"]] = by_user.get(r["user_id"], 0) + r["n_events"]
    assert by_user == totals


def test_running_totals_stateful_across_batches(spark, tmp_path):
    """applyInPandasWithState carries per-key state between micro-batches."""
    ev = load(spark, "events").select("user_id", "value", "ts")
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    # two spool files -> two micro-batches under availableNow? (file source
    # may still batch them together; correctness must hold either way)
    ev.filter(F.col("user_id") < 5).coalesce(1).write.mode("append").json(src_dir)
    ev.filter(F.col("user_id") >= 5).coalesce(1).write.mode("append").json(src_dir)

    stream = spark.readStream.schema(ev.schema).json(src_dir)
    q = (
        running_totals_stateful(stream)
        .writeStream.format("memory")
        .queryName("state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    # last emitted row per key = final running totals
    out = spark.sql(
        "SELECT user_id, n_events, total_value FROM state_test"
    ).collect()
    final = {}
    for r in out:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    want = {
        r["user_id"]: (r["n"], pytest.approx(r["s"], rel=1e-9))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(want)
    for k in want:
        assert final[k][0] == want[k][0]
        assert final[k][1] == want[k][1]


# --- schema evolution -----------------------------------------------------

OLD = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
)
NEW = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("age", T.IntegerType()),
    ]
)


def test_diff_schemas_classification():
    d = diff_schemas(OLD, NEW)
    assert d.added == [("age", "int")] and d.is_additive

    changed = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
    )
    d2 = diff_schemas(OLD, changed)
    assert d2.type_changed == [("id", "bigint", "string")]
    assert not d2.is_additive

    dropped = T.StructType([T.StructField("id", T.LongType())])
    assert diff_schemas(OLD, dropped).removed == [("name", "string")]


def test_evolve_union_additive(spark):
    old_df = spark.createDataFrame([(1, "a")], OLD)
    new_df = spark.createDataFrame([(2, "b", 30)], NEW)
    out = evolve_union(old_df, new_df).orderBy("id").collect()
    assert [tuple(r) for r in out] == [(1, "a", None), (2, "b", 30)]


def test_evolve_union_rejects_type_change(spark):
    old_df = spark.createDataFrame([(1, "a")], OLD)
    bad = spark.createDataFrame(
        [("1", "a")],
        T.StructType(
            [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
        ),
    )
    with pytest.raises(ValueError, match="non-additive"):
        evolve_union(old_df, bad)


def test_align_to_evolved_projection(spark):
    df = spark.createDataFrame([(1, "a")], OLD)
    out = align_to_evolved(df, NEW)
    assert out.schema == NEW
    assert out.collect()[0]["age"] is None


def test_windowed_append_mode_emits_closed_windows(spark, tmp_path):
    """Append mode + watermark: only windows the watermark has passed are
    emitted; late rows beyond the watermark are dropped from closed
    windows (the standard streaming-agg contract — contrast with the CDC
    plane's never-drop staleness flag)."""
    import json as _json

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [
        {"user_id": 1, "value": 1.0, "ts": "2024-01-01 10:00:00", "event_type": "a"},
        {"user_id": 1, "value": 2.0, "ts": "2024-01-01 10:20:00", "event_type": "a"},
        # an event far ahead moves the watermark past the 10:00 window
        {"user_id": 2, "value": 9.0, "ts": "2024-01-03 00:00:00", "event_type": "a"},
    ]
    with open(f"{src}/a.json", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")

    schema = "user_id long, value double, ts timestamp, event_type string"
    stream = spark.readStream.schema(schema).json(src)
    from sqlserver_pg_cdc_spark.streaming.windows import windowed_event_counts

    q = (
        windowed_event_counts(stream, window_len="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("append_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    first = {
        (r["window_start"].isoformat(), r["n_events"])
        for r in spark.sql("SELECT * FROM append_test").collect()
    }
    # the 10:00 window is closed (watermark advanced to Jan 2 23:00) and
    # emitted with both rows; the Jan 3 window stays open and unemitted
    assert ("2024-01-01T10:00:00", 2) in first
    assert not any(s.startswith("2024-01-03") for s, _ in first)


def test_sliding_counts_streaming_matches_batch(spark, tmp_path):
    """Sliding windows over readStream == the same operator over the
    batch frame; every event appears in exactly len/slide windows."""
    from sqlserver_pg_cdc_spark.streaming.windows import sliding_event_counts

    ev = load(spark, "events").limit(400)
    src_dir = str(tmp_path / "src")
    ev.write.json(src_dir)
    stream = spark.readStream.schema(ev.schema).json(src_dir)
    q = (
        sliding_event_counts(stream, window_len="1 day", slide="6 hours",
                             watermark="2 hours")
        .writeStream.format("memory")
        .queryName("slide_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM slide_test").collect()
    }
    batch = sliding_event_counts(ev, window_len="1 day", slide="6 hours")
    want = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in batch.collect()
    }
    assert got == want
    # 4x multiplicity: total (window, event) memberships = 4 * events
    assert sum(want.values()) == 4 * ev.count()
