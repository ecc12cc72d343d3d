"""Round-12 optimization pins: the per-task payload-decode memo
(`operators/multimodal._memo_by_payload`) and the duplicate-insensitive
`vframe_near_clip_pairs` aggregation (the pre-groupBy distinct was
dropped — guide §2.4)."""

import numpy as np

from sqlserver_pg_cdc_spark.operators import multimodal as mm


class TestMemoByPayload:
    def test_identical_results_and_single_decode(self):
        calls = []

        def fn(b: bytes) -> int:
            calls.append(b)
            return len(b) * 7

        memo = mm._memo_by_payload(fn)
        payloads = [b"aaa", b"bb", b"aaa", b"aaa", b"bb", b"cccc"]
        got = [memo(b) for b in payloads]
        assert got == [len(b) * 7 for b in payloads]
        # one underlying call per DISTINCT payload
        assert sorted(calls) == sorted([b"aaa", b"bb", b"cccc"])

    def test_none_results_are_memoized(self):
        calls = []

        def fn(b: bytes):
            calls.append(b)
            return None

        memo = mm._memo_by_payload(fn)
        assert memo(b"x") is None
        assert memo(b"x") is None
        assert len(calls) == 1  # a None (corrupt-decode) result caches too

    def test_cap_eviction_keeps_results_correct(self):
        def fn(b: bytes) -> int:
            return int.from_bytes(b, "big")

        memo = mm._memo_by_payload(fn, max_entries=4)
        vals = [i.to_bytes(2, "big") for i in range(20)] * 2
        assert [memo(b) for b in vals] == [fn(b) for b in vals]

    def test_byte_budget_bounds_payload_sized_results(self):
        # round-12 ADVICE: wrappers whose results are PAYLOAD-sized
        # (resize/resample/thumbnail re-encodes) must clear on a byte
        # budget, not only on the entry cap — and results stay correct
        # across evictions
        def fn(b: bytes) -> bytes:
            return b * 2

        memo = mm._memo_by_payload(fn, max_entries=10_000, max_bytes=4096)
        vals = [bytes([i % 251]) * 512 for i in range(64)] * 2
        assert [memo(b) for b in vals] == [fn(b) for b in vals]
        # a single over-budget result passes through without being held
        big = bytes(16)
        memo2 = mm._memo_by_payload(fn, max_bytes=8)
        assert memo2(big) == fn(big)
        assert memo2(big) == fn(big)

    def test_fingerprint_ops_identical_across_duplicate_payloads(self, spark):
        # two docs share payload bytes; two differ — the memo must not
        # leak one payload's fingerprint onto another
        px_a = np.full((40, 40, 3), 17, dtype=np.uint8)
        px_b = np.arange(40 * 40 * 3, dtype=np.uint8).reshape(40, 40, 3)
        pa = mm.encode_bmp(40, 40, px_a.tobytes())
        pb = mm.encode_bmp(40, 40, px_b.tobytes())
        df = spark.createDataFrame(
            [(1, pa), (2, pa), (3, pb), (4, None), (5, b"\x00\x00junk")],
            "doc_id long, payload binary",
        ).repartition(1)  # one task => one memo instance sees all rows
        rows = {
            r["doc_id"]: r["phash"]
            for r in mm.phash_images(df, "doc_id", "payload").collect()
        }
        assert rows[1] == rows[2] and rows[1] is not None
        assert rows[3] is not None and rows[3] != rows[1]
        assert rows[4] is None and rows[5] is None


class TestVframePairsNoDistinct:
    def test_multi_band_matches_do_not_inflate_counts(self, spark):
        # identical arrays match in EVERY band (Hamming 0) — without the
        # old distinct the duplicate candidate rows must still aggregate
        # to one pair with exact n_frames / hamming
        fh = [1 << 3, 1 << 20, 1 << 40]
        df = spark.createDataFrame(
            [(1, fh), (2, fh), (3, [1 << 62])],
            "doc_id long, fhashes array<long>",
        )
        out = mm.vframe_near_clip_pairs(
            df, max_hamming=6, min_frames=3
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["a"], r["b"]) == (1, 2)
        assert r["n_frames"] == 3
        assert r["hamming"] == 0

    def test_short_clips_never_pair(self, spark):
        # arrays shorter than min_frames cannot reach n_frames >= k,
        # not even identical twins (the recut-query collapse guard
        # relies on exactly this law)
        fh = [1 << 3, 1 << 20]
        df = spark.createDataFrame(
            [(1, fh), (2, fh)], "doc_id long, fhashes array<long>"
        )
        assert (
            mm.vframe_near_clip_pairs(df, max_hamming=6, min_frames=3)
            .count() == 0
        )
