"""Motion-compensated DCT video codec (encode_mcv/decode_mcv): the
inter-frame family. Contracts: exact reconstruction of block-aligned
flat content (the analytic-oracle anchor), real motion compensation
(P-frames track a moving textured block at a fraction of intra cost),
closed-loop drift-freedom, macroblock mode decision, strict structural
validation, and the Spark video-sampler path."""

import numpy as np
import pytest

from sqlserver_pg_cdc_spark.operators.multimodal import (
    _mcv_dct_matrix,
    _mcv_zigzag,
    decode_mcv,
    encode_mcv,
    sample_video_frames,
)


def _rect_frame(
    f: int, bg: int = 32, fg: int = 200, h: int = 48, w: int = 64
) -> np.ndarray:
    img = np.full((h, w, 3), bg, dtype=np.uint8)
    x = 16 * (f % 3)
    img[16:32, x : x + 16] = fg
    return img


def test_dct_matrix_is_orthonormal_and_zigzag_is_permutation():
    d = _mcv_dct_matrix()
    assert np.abs(d @ d.T - np.eye(8)).max() < 1e-12
    zz = _mcv_zigzag()
    assert sorted(zz.tolist()) == list(range(64))
    # spec spot-pins: start of the classic zigzag walk
    assert zz[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_block_aligned_flat_content_reconstructs_exactly():
    frames = [_rect_frame(f) for f in range(8)]
    p = encode_mcv(frames, fps=25, gop=4, qscale=4)
    got = decode_mcv(p)
    assert got is not None
    w, h, fps, out = got
    assert (w, h, fps, len(out)) == (64, 48, 25, 8)
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)
    # inter coding pays off: >100x under raw RGB
    assert len(p) * 100 < 8 * 48 * 64 * 3


def test_motion_compensation_tracks_texture():
    """A textured 16x16 block moving 4 px/frame: P-frames must land
    near-transparent AND an order of magnitude under the I-frame cost
    — only a found motion vector can do both."""
    rng = np.random.default_rng(3)
    tex = rng.integers(0, 255, (16, 16), dtype=np.uint8)
    frames = []
    for f in range(6):
        img = np.full((48, 64, 3), 100, dtype=np.uint8)
        x = 16 + 4 * f  # stays clear of the frame edge: trackable
        img[16:32, x : x + 16] = tex[:, :, None]
        frames.append(img)
    p = encode_mcv(frames, gop=6, qscale=4)
    got = decode_mcv(p)
    assert got is not None
    _, _, _, out = got
    for a, b in zip(frames, out):
        err = a.astype(np.float64) - b.astype(np.float64)
        snr = 10 * np.log10(
            (a.astype(np.float64) ** 2).mean() / max((err**2).mean(), 1e-12)
        )
        assert snr > 40
    # motion compensation pays: the inter stream must be far under the
    # same frames coded all-intra (only found MVs can deliver that on
    # moving texture)
    p_intra = encode_mcv(frames, gop=1, qscale=4)
    assert len(p) * 3 < len(p_intra)


def test_no_drift_across_long_gop():
    """Closed-loop prediction: frame 15 of a static noisy scene must
    reconstruct exactly as well as frame 1 (encoder predicts from its
    own reconstruction, so error cannot accumulate)."""
    rng = np.random.default_rng(9)
    g = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    base = np.stack([g, g, g], axis=2)  # gray: survives 4:2:0 exactly
    frames = [base.copy() for _ in range(16)]
    p = encode_mcv(frames, gop=16, qscale=4)
    _, _, _, out = decode_mcv(p)

    def err(i):
        return np.abs(
            out[i].astype(np.int64) - base.astype(np.int64)
        ).max()

    assert err(15) <= err(1) + 1  # static scene: all-skip after frame 0


def test_intra_fallback_on_scene_cut():
    """A hard scene cut mid-GOP: prediction is useless, macroblocks
    flip to intra mode, and quality holds anyway."""
    rng = np.random.default_rng(11)
    g = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    a = np.stack([g, g, g], axis=2)  # gray: survives 4:2:0
    b = 255 - a
    frames = [a, a, b, b]
    p = encode_mcv(frames, gop=4, qscale=4)
    got = decode_mcv(p)
    assert got is not None
    _, _, _, out = got
    for ref, dec in zip(frames, out):
        err = ref.astype(np.float64) - dec.astype(np.float64)
        snr = 10 * np.log10(
            (ref.astype(np.float64) ** 2).mean()
            / max((err**2).mean(), 1e-12)
        )
        assert snr > 35


def test_structural_damage_returns_none():
    p = encode_mcv([_rect_frame(f) for f in range(4)], gop=2)
    assert decode_mcv(p) is not None
    assert decode_mcv(p[: len(p) * 3 // 5]) is None  # truncation
    assert decode_mcv(b"\x00\x00" + p) is None  # destroyed magic
    bad = bytearray(p)
    bad[-3] ^= 0xFF  # inside the last frame's payload
    assert decode_mcv(bytes(bad)) is None  # frame CRC
    bad2 = bytearray(p)
    bad2[6] ^= 0x01  # width byte
    assert decode_mcv(bytes(bad2)) is None  # header CRC
    assert decode_mcv(b"") is None
    assert decode_mcv(p[:12]) is None


def test_max_frames_prefix_still_validates_tail():
    frames = [_rect_frame(f) for f in range(8)]
    p = encode_mcv(frames, gop=4)
    got = decode_mcv(p, max_frames=3)
    assert got is not None and len(got[3]) == 3
    assert np.array_equal(got[3][2], frames[2])
    # truncating the TAIL (beyond the decoded prefix) must still fail:
    # the walk validates every frame's length + CRC
    assert decode_mcv(p[:-4], max_frames=3) is None


def test_sample_video_frames_mcv_through_spark(spark):
    import pandas as pd

    docs = []
    for doc_id in range(5):
        bg = 32 + 8 * (doc_id % 5)
        frames = [_rect_frame(f, bg=bg) for f in range(6)]
        p = encode_mcv(frames, fps=25, gop=4, qscale=4)
        if doc_id == 3:
            p = p[: len(p) * 3 // 5]
        docs.append((doc_id, p))
    df = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    out = sample_video_frames(
        df, "doc_id", "payload", stride=2, max_frames=3, decoder="mcv"
    ).toPandas()
    assert set(out.doc_id) == {0, 1, 2, 4}
    assert (out.groupby("doc_id").frame_idx.count() == 3).all()
    assert sorted(out.frame_idx.unique()) == [0, 2, 4]
    for _, r in out.iterrows():
        bg = 32 + 8 * (r.doc_id % 5)
        expected = (256 * 200 + (48 * 64 - 256) * bg) / (48 * 64 * 255)
        assert r.mean_pixel == pytest.approx(expected, abs=1e-12)
        assert (r.width, r.height) == (64, 48)
        assert r.frame_offset_ms == r.frame_idx * 1000 // 25


def test_video_thumbnails_exact_and_mjpeg_path(spark):
    """Thumbnails: MCV path exact on block-aligned content (pixels are
    the sampled originals re-encoded as BMP); MJPEG path yields rows
    with NULL payload for an individually corrupt sampled frame."""
    import pandas as pd

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _bmp_pixels,
        encode_jpeg,
        encode_mjpeg,
        video_thumbnails,
    )

    frames = [_rect_frame(f, bg=48) for f in range(6)]
    p = encode_mcv(frames, fps=25, gop=4)
    df = spark.createDataFrame(
        pd.DataFrame([(7, p)], columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    out = video_thumbnails(
        df, "doc_id", "payload", width=8, height=8,
        stride=2, max_frames=3, decoder="mcv",
    ).collect()
    assert sorted(r["frame_idx"] for r in out) == [0, 2, 4]
    for r in out:
        px = _bmp_pixels(bytes(r["payload"]))
        src = frames[r["frame_idx"]]
        ys = (np.arange(8) * 48) // 8
        xs = (np.arange(8) * 64) // 8
        # BGR of gray == gray
        assert np.array_equal(px, src[np.ix_(ys, xs)][:, :, ::-1])
        assert r["frame_offset_ms"] == r["frame_idx"] * 1000 // 25

    # MJPEG path: second sampled frame corrupt -> NULL payload row
    g = np.full((16, 16), 128, dtype=np.uint8)
    j = encode_jpeg(16, 16, g.tobytes(), channels=1)
    # middle frame flips SOF0 -> SOF2 (progressive): structurally a
    # valid marker stream (the splitter keeps three spans) but outside
    # the baseline decoder's scope -> NULL payload row
    pos = j.find(b"\xff\xc0")
    assert pos > 0
    bad = j[:pos + 1] + b"\xc2" + j[pos + 2 :]
    stream = encode_mjpeg([j, bad, j])
    df2 = spark.createDataFrame(
        pd.DataFrame([(1, stream)], columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    out2 = video_thumbnails(
        df2, "doc_id", "payload", width=4, height=4, decoder="mjpeg"
    ).collect()
    by_idx = {r["frame_idx"]: r for r in out2}
    assert by_idx[1]["payload"] is None
    assert by_idx[0]["payload"] is not None and by_idx[2]["payload"] is not None


def test_odd_motion_vectors_are_found_and_round_trip():
    """Round-9 advice (high): the +/-4 refinement emits ODD motion
    vectors, which the decoder used to reject wholesale — any clip
    whose true motion is odd encoded to a stream its own decoder
    refused. Pin both halves: the search FINDS the odd vector, and the
    full encode/decode round-trips odd-shift content."""
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _mcv_motion_search,
    )

    rng = np.random.default_rng(11)
    ref = rng.integers(0, 255, (64, 64), dtype=np.uint8)
    cur = np.roll(ref, (3, 1), axis=(0, 1))
    # block (16,16) of cur is ref[13:29, 15:31]: true MV is (-3, -1)
    dy, dx, sad = _mcv_motion_search(ref, cur, 16, 16)
    assert (dy, dx, sad) == (-3, -1, 0)

    tex = rng.integers(0, 255, (48, 64), dtype=np.uint8)
    frames = []
    for f in range(4):
        frames.append(
            np.repeat(
                np.roll(tex, (3 * f, f), axis=(0, 1))[:, :, None], 3, axis=2
            )
        )
    p = encode_mcv(frames, gop=4, qscale=4)
    got = decode_mcv(p)
    assert got is not None
    _, _, _, out = got
    assert len(out) == 4
    for a, b in zip(frames, out):
        err = a.astype(np.float64) - b.astype(np.float64)
        snr = 10 * np.log10(
            (a.astype(np.float64) ** 2).mean() / max((err**2).mean(), 1e-12)
        )
        assert snr > 30


def test_zip_bomb_frame_body_is_rejected_bounded():
    """Round-9 advice (medium): a crafted frame (valid CRC-16 over a
    DEFLATE bomb) must be rejected by the bounded inflate computed
    from the CRC-validated header dims — not expanded to gigabytes."""
    import zlib

    from sqlserver_pg_cdc_spark.operators.multimodal import _crc16

    one = np.full((16, 16, 3), 128, dtype=np.uint8)
    header = encode_mcv([one])[:18]  # magic+fields+header CRC, n_frames=1
    bomb = zlib.compress(b"\x00" * (8 << 20), 9)  # 8 MB of zeros
    crafted = (
        header
        + bytes([0])
        + len(bomb).to_bytes(3, "big")
        + bomb
        + _crc16(bomb).to_bytes(2, "big")
    )
    assert decode_mcv(crafted) is None
    # valid CRC over garbage that is not a DEFLATE stream: zlib.error
    # is the NULL-on-corrupt contract too, never a task failure
    junk = b"\x12\x34\x56\x78"
    crafted2 = (
        header
        + bytes([0])
        + len(junk).to_bytes(3, "big")
        + junk
        + _crc16(junk).to_bytes(2, "big")
    )
    assert decode_mcv(crafted2) is None


def test_video_thumbnails_fps_parameter_sets_mjpeg_timestamps(spark):
    """Round-9 advice (low): MJPEG/AVI elementary streams carry no
    frame rate — the fps parameter (mirroring sample_video_frames)
    must set frame_offset_ms, not a hardcoded 25."""
    import pandas as pd

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_jpeg,
        encode_mjpeg,
        video_thumbnails,
    )

    g = np.full((16, 16), 90, dtype=np.uint8)
    j = encode_jpeg(16, 16, g.tobytes(), channels=1)
    stream = encode_mjpeg([j, j, j, j])
    df = spark.createDataFrame(
        pd.DataFrame([(1, stream)], columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    out = video_thumbnails(
        df, "doc_id", "payload", width=4, height=4,
        decoder="mjpeg", fps=50,
    ).collect()
    by_idx = {r["frame_idx"]: r for r in out}
    assert set(by_idx) == {0, 1, 2, 3}
    for idx, r in by_idx.items():
        assert r["frame_offset_ms"] == idx * 1000 // 50


def test_video_frame_fingerprints_law_and_recut_pairs(spark):
    """Per-frame fingerprint family (`video_frame_fingerprints` +
    `vframe_near_clip_pairs`): same scene -> bit-exact frame hash
    across codec/container/position/cut; the >= k matching-frames law
    catches a re-cut the single temporal fold provably misses."""
    import pandas as pd

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg,
        encode_mcv,
        sample_frames_for_vhash,
        vframe_near_clip_pairs,
        vhash_frames,
        video_frame_fingerprints,
    )
    from sqlserver_pg_cdc_spark.workload import _RECUT_FRAMES, _recut_scene

    def clip(cls, cut, container):
        idxs = _RECUT_FRAMES if cut == "recut" else range(8)
        frames = [_recut_scene(cls, f) for f in idxs]
        if container == "mcv":
            return encode_mcv(frames, fps=10, gop=4, qscale=4)
        return encode_avi_mjpeg(
            [encode_jpeg(48, 32, f.tobytes()) for f in frames],
            48, 32, fps=10,
        )

    rows = [
        (1, clip(0, "orig", "mcv")),
        (2, clip(0, "recut", "avi")),   # re-cut of 1, other container
        (3, clip(4, "orig", "avi")),    # distinct class
        (4, b"\x00not-a-video"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    fps = video_frame_fingerprints(df, "doc_id", "payload")
    got = {r["doc_id"]: r["fhashes"] for r in fps.collect()}
    assert len(got[1]) == 8 and len(got[2]) == 4 and got[4] is None
    # same-scene frames are bit-exact across codec and cut: the
    # re-cut's frames are a subset of the original's
    assert set(got[2]) <= set(got[1])
    assert not set(got[2]) & set(got[3])
    pairs = {
        (r["a"], r["b"]): (r["n_frames"], r["hamming"])
        for r in vframe_near_clip_pairs(
            fps, max_hamming=6, min_frames=3
        ).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == (4, 0)
    # the clip-level fold misses the same re-cut (the documented
    # tradeoff this family exists to close)
    fo = vhash_frames(sample_frames_for_vhash(clip(0, "orig", "mcv")))
    fr = vhash_frames(sample_frames_for_vhash(clip(0, "recut", "avi")))
    assert bin(fo ^ fr).count("1") > 6
