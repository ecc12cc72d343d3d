"""Z-order layout and compaction tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.sources.layout import (
    compact,
    file_column_spans,
    small_file_report,
    write_zordered,
    zorder_key,
)
from sqlserver_pg_cdc_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def _morton(vals: list[int], bits: int) -> int:
    out = 0
    k = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * k + j)
    return out


def test_zorder_key_matches_python_morton(spark):
    # x,y already in [0, 15]: with stats=(0,15) and bits=4 the scaling is
    # identity, so the key must equal the exact Morton interleave
    df = spark.sql(
        "SELECT x, y FROM VALUES (0,0),(1,2),(3,3),(7,11),(15,15),(8,4) v(x,y)"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", zorder_key(df, ["x", "y"], bits=4, stats={"x": (0, 15), "y": (0, 15)})
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton([x, y], 4), (x, y, z)


def test_zorder_key_rejects_all_null_column(spark):
    import pytest

    df = spark.sql(
        "SELECT x, CAST(NULL AS DOUBLE) AS y FROM VALUES (0),(1),(2) v(x)"
    )
    with pytest.raises(ValueError, match="'y'"):
        zorder_key(df, ["x", "y"], bits=4)


def test_zorder_key_rejects_none_in_supplied_stats(spark):
    import pytest

    df = spark.sql("SELECT x FROM VALUES (0),(1) v(x)")
    with pytest.raises(ValueError, match="'x'"):
        zorder_key(df, ["x"], bits=4, stats={"x": (None, None)})


def test_zorder_key_rejects_non_castable_column(spark):
    import pytest

    df = spark.sql("SELECT x, 'abc' AS s FROM VALUES (0),(1) v(x)")
    with pytest.raises(ValueError, match="'s'"):
        zorder_key(df, ["x", "s"], bits=4)


def test_zorder_clusters_both_columns(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "z")
    write_zordered(ev, path, ["user_id", "value"], bits=8, num_files=8)

    back = spark.read.parquet(path)
    assert back.count() == ev.count()

    g = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    u_span = g[1] - g[0] or 1
    v_span = g[3] - g[2] or 1
    spans = file_column_spans(path, ["user_id", "value"])
    assert len(spans) == 8
    # each file must cover a small fraction of the (user_id x value)
    # plane: that fraction IS the expected stats-pruning selectivity
    areas = []
    for s in spans:
        (umn, umx), (vmn, vmx) = s["user_id"], s["value"]
        areas.append(((umx - umn) / u_span) * ((vmx - vmn) / v_span))
    assert sum(areas) / len(areas) < 0.5, areas
    # and a 2-D box probe must be answerable from a strict subset of files
    probe_u = g[0] + u_span * 0.1
    probe_v = g[2] + v_span * 0.1
    hit = [
        s
        for s in spans
        if s["user_id"][0] <= probe_u <= s["user_id"][1]
        and s["value"][0] <= probe_v <= s["value"][1]
    ]
    assert len(hit) < len(spans)


def test_compact_small_files(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "frag")
    ev.repartition(64).write.parquet(path)
    n = ev.count()

    before = small_file_report(path, small_bytes=1 << 20)
    assert before["n_files"] == 64

    target = max(1, before["total_bytes"] // 4)
    rep = compact(spark, path, target_file_bytes=target)
    after = rep["after"]
    assert 1 <= after["n_files"] <= 8
    assert after["n_files"] < before["n_files"]
    assert spark.read.parquet(path).count() == n


def test_compact_with_sort_improves_spans(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    path = str(tmp_path / "sorted")
    ev.repartition(16).write.parquet(path)
    compact(
        spark,
        path,
        target_file_bytes=max(1, small_file_report(path)["total_bytes"] // 4),
        sort_cols=["user_id"],
    )
    spans = file_column_spans(path, ["user_id"])
    g = ev.agg(F.min("user_id"), F.max("user_id")).collect()[0]
    full = g[1] - g[0] or 1
    # range-sorted compaction: files tile the key space, so per-file
    # spans must sum to ~the full span (disjoint), not n_files * full
    total = sum(s["user_id"][1] - s["user_id"][0] for s in spans)
    assert total <= full * 1.5, (total, full, len(spans))


# --- manifest-indirected compaction -----------------------------------------


def test_manifested_write_read_roundtrip(spark, tmp_path):
    from sqlserver_pg_cdc_spark.sources import layout as L

    path = str(tmp_path / "mtab")
    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    gen = L.write_manifested(df, path)
    assert L.current_generation(path) == gen
    got = L.read_manifested(spark, path)
    assert got.count() == 1000
    assert {r["v"] for r in got.filter("id < 3").collect()} == {0, 2, 4}


def test_manifested_compact_no_reader_gap(spark, tmp_path):
    """A reader that resolved the manifest BEFORE the compaction swap
    must still read its generation completely AFTER the swap (the
    one-generation grace window), and a reader resolving after sees the
    compacted generation — at no instant is the table path missing."""
    import os

    from sqlserver_pg_cdc_spark.sources import layout as L

    path = str(tmp_path / "mtab")
    df = spark.range(5000).selectExpr("id", "CAST(id % 7 AS DOUBLE) AS v")
    L.write_manifested(df.repartition(20), path)

    # reader A resolves the manifest now (pre-compaction)
    gen_a = L.current_generation(path)
    pre_df = spark.read.parquet(os.path.join(path, gen_a))

    rep = L.compact_manifested(spark, path, target_file_bytes=1 << 30)
    assert rep["after"]["n_files"] < rep["before"]["n_files"]

    # post-swap: reader A's generation is still fully on disk
    assert pre_df.count() == 5000
    assert os.path.isdir(os.path.join(path, gen_a))
    # reader B resolves fresh and sees the compacted generation
    gen_b = L.current_generation(path)
    assert gen_b != gen_a
    assert L.read_manifested(spark, path).count() == 5000

    # a second compaction sweeps generation A (grace = one cycle)
    L.compact_manifested(spark, path, target_file_bytes=1 << 30)
    assert not os.path.isdir(os.path.join(path, gen_a))


def test_manifested_compact_crash_leaves_readable_table(spark, tmp_path):
    """A stranded generation with no manifest swing (crash between the
    generation write and the manifest rename) must not disturb readers
    and is swept by the next successful swap."""
    import os

    from sqlserver_pg_cdc_spark.sources import layout as L

    path = str(tmp_path / "mtab")
    L.write_manifested(spark.range(100).selectExpr("id"), path)
    gen0 = L.current_generation(path)
    # simulate the crash artifact: an unreferenced generation
    stranded = os.path.join(path, "gen_deadbeef0000")
    spark.range(5).write.parquet(stranded)
    assert L.read_manifested(spark, path).count() == 100  # undisturbed
    L.compact_manifested(spark, path, target_file_bytes=1 << 30)
    assert not os.path.isdir(stranded)  # GC'd by the swap's sweep
    assert L.read_manifested(spark, path).count() == 100
    # row-count verification failure leaves the manifest untouched
    gen_now = L.current_generation(path)
    assert gen_now != gen0 and L.read_manifested(spark, path).count() == 100
