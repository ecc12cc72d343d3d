"""Stream-stream interval join: streaming drain must reproduce the batch
relational result for on-time data."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.sources.parquet import load_table
from sqlserver_pg_cdc_spark.streaming.joins import attribution_join, interval_join

SF_DIR = "/root/testdata/sf0.001"


def _attribution_key(r):
    return (r["user_id"], r["trigger_id"], r["outcome_id"])


def test_attribution_batch_sanity(spark):
    ev = load_table(spark, SF_DIR, "events")
    rows = attribution_join(ev).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["outcome_ts"] >= r["trigger_ts"]
        assert (r["outcome_ts"] - r["trigger_ts"]).total_seconds() <= 3600


def test_stream_stream_join_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").limit(2000)
    src = str(tmp_path / "src")
    ev.write.json(src)
    want = {_attribution_key(r) for r in attribution_join(ev).collect()}
    assert want  # fixture must actually produce matches

    schema = ev.schema
    clicks = spark.readStream.schema(schema).json(src)
    purchases = spark.readStream.schema(schema).json(src)
    joined = attribution_join(
        clicks.filter(F.col("event_type") == "click").unionByName(
            purchases.filter(F.col("event_type") == "purchase")
        )
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attr_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        _attribution_key(r) for r in spark.sql("SELECT * FROM attr_test").collect()
    }
    assert got == want


def test_interval_join_left_outer_batch(spark):
    rows_l = [(1, "2024-01-01 10:00:00", "a"), (2, "2024-01-01 10:00:00", "b")]
    rows_r = [(1, "2024-01-01 10:30:00", 5.0), (2, "2024-01-02 10:00:00", 7.0)]
    l = spark.sql(
        "SELECT k, CAST(ts AS TIMESTAMP) AS ts, tag FROM VALUES "
        + ", ".join(f"({k}, '{t}', '{g}')" for k, t, g in rows_l)
        + " v(k, ts, tag)"
    )
    r = spark.sql(
        "SELECT k, CAST(ts AS TIMESTAMP) AS ts, val FROM VALUES "
        + ", ".join(f"({k}, '{t}', {v}D)" for k, t, v in rows_r)
        + " v(k, ts, val)"
    )
    out = interval_join(l, r, on=["k"], how="left").collect()
    by_k = {row["k"]: row for row in out}
    assert by_k[1]["r_val"] == 5.0  # within the hour
    assert by_k[2]["r_val"] is None  # next day: no match, null-extended
