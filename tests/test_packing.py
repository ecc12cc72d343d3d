"""Sequence packing (context-window bin packing) tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.packing import (
    pack_chunked,
    pack_sequences,
    packing_stats,
)


def _greedy(tokens: list[int], cap: int) -> list[tuple[int, int]]:
    out, b, fill = [], 0, 0
    for t in tokens:
        if fill > 0 and fill + t > cap:
            b += 1
            fill = t
        else:
            fill += t
        out.append((b, fill))
    return out


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        # group a: mixes small docs and one oversize (tok=50 > cap=32)
        ("a", 1, 10), ("a", 2, 20), ("a", 3, 5), ("a", 4, 50),
        ("a", 5, 16), ("a", 6, 16), ("a", 7, 1),
        # group b: exact-fit boundary (10+22 == cap stays, +1 overflows)
        ("b", 1, 10), ("b", 2, 22), ("b", 3, 1), ("b", 4, 32),
    ]
    return spark.createDataFrame(rows, "grp string, ord long, tok long")


def test_pack_matches_python_greedy(frame):
    got = {
        (r["grp"], r["ord"]): (r["bin_id"], r["bin_fill"])
        for r in pack_sequences(frame, "grp", "ord", "tok", 32).collect()
    }
    rows = sorted(
        [(g, o, t) for g, o, t in frame.collect()], key=lambda r: (r[0], r[1])
    )
    for grp in {r[0] for r in rows}:
        toks = [t for g, _, t in rows if g == grp]
        ords = [o for g, o, _ in rows if g == grp]
        for o, (b, fill) in zip(ords, _greedy(toks, 32)):
            assert got[(grp, o)] == (b, fill), (grp, o)


def test_bins_never_overflow_except_single_oversize(spark, frame):
    packed = pack_sequences(frame, "grp", "ord", "tok", 32)
    per_bin = (
        packed.groupBy("grp", "bin_id")
        .agg(F.sum("tok").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in per_bin:
        assert r["total"] <= 32 or r["n"] == 1, r


def test_exact_fit_stays_in_bin(frame):
    got = {
        (r["grp"], r["ord"]): r["bin_id"]
        for r in pack_sequences(frame, "grp", "ord", "tok", 32).collect()
    }
    # b: 10+22 == 32 fits bin 0; the next doc (1 token) must open bin 1
    assert got[("b", 1)] == got[("b", 2)] == 0
    assert got[("b", 3)] == 1


def test_pack_chunked_bins_monotone_and_bounded(spark):
    import random

    rng = random.Random(7)
    rows = [
        (f"g{i % 3}", i, rng.randint(1, 40)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "grp string, ord long, tok long")
    packed = pack_chunked(df, "grp", "ord", "tok", 64, chunk_rows=50)
    rows_out = sorted(packed.collect(), key=lambda r: (r["grp"], r["ord"]))
    by_grp: dict[str, list] = {}
    for r in rows_out:
        by_grp.setdefault(r["grp"], []).append(r)
    assert len(rows_out) == 300
    unchunked_bins = {
        r["grp"]: r["n_bins"]
        for r in packing_stats(
            pack_sequences(df, "grp", "ord", "tok", 64), "grp", "tok", 64
        ).collect()
    }
    for grp, rs in by_grp.items():
        bins = [r["bin_id"] for r in rs]
        # globally monotone non-decreasing in document order, 0-based
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
        # every bin's fill bounded (no oversize docs in this fixture: tok<=40<64)
        fills: dict[int, int] = {}
        for r in rs:
            fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["tok"]
        assert all(v <= 64 for v in fills.values())
        # chunk-boundary cost only: at most one extra bin per chunk
        n_chunks = (len(rs) + 49) // 50
        assert max(bins) + 1 <= unchunked_bins[grp] + n_chunks - 1


def test_packing_stats_utilization(spark, frame):
    stats = {
        r["grp"]: r
        for r in packing_stats(
            pack_sequences(frame, "grp", "ord", "tok", 32), "grp", "tok", 32
        ).collect()
    }
    a = stats["a"]
    assert a["n_docs"] == 7
    assert a["n_tokens"] == 118
    assert a["utilization"] == 118 / (a["n_bins"] * 32)


def test_capacity_validation(frame):
    with pytest.raises(ValueError):
        pack_sequences(frame, "grp", "ord", "tok", 0)
