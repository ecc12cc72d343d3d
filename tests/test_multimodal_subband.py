"""Psychoacoustic subband codec (encode_subband/decode_subband): the
lossy perceptual family. Contracts: exact TDAC filterbank (perfect
reconstruction before quantization), SNR that scales with the MPEG-
style bitrate budget, psychoacoustic allocation (masked bands get
fewer bits than isolated ones), grouped-quantizer laws, strict
structural validation (magic/CRC/truncation -> None), and the Spark
frame-sampler path."""

import math

import numpy as np
import pytest

from sqlserver_pg_cdc_spark.operators.multimodal import (
    _SB_GROUP_BITS,
    _SB_NLEVELS,
    _SB_SCF,
    _sb_allocate,
    _sb_analysis,
    _sb_scf_index,
    _sb_smr,
    _sb_synthesis,
    decode_subband,
    encode_subband,
    sample_audio_frames,
)


def _snr_db(ref: np.ndarray, out: np.ndarray) -> float:
    err = out.astype(np.float64) - ref.astype(np.float64)
    return 10.0 * math.log10(
        float((ref.astype(np.float64) ** 2).mean()) / float((err**2).mean())
    )


def test_filterbank_perfect_reconstruction():
    rng = np.random.default_rng(7)
    x = rng.standard_normal(5000) * 0.5
    coef = _sb_analysis(x)
    y = _sb_synthesis(coef, len(x))
    assert np.abs(y - x).max() < 1e-10  # exact TDAC, quantizer off


def test_dc_near_exact_at_high_bitrate():
    x = np.full(2500, 9200, dtype=np.int16)
    rate, y = decode_subband(encode_subband(1000, x, kbps=192))
    assert rate == 1000 and len(y) == 2500
    assert np.abs(y.astype(int) - x.astype(int)).max() <= 1


def test_snr_scales_with_bitrate_and_compresses():
    t = np.arange(48000)
    sig = (12000 * np.sin(2 * np.pi * 440 * t / 48000)).astype(np.int16)
    snrs, sizes = [], []
    for kbps in (64, 128, 192):
        p = encode_subband(48000, sig, kbps=kbps)
        _, y = decode_subband(p)
        snrs.append(_snr_db(sig, y))
        sizes.append(len(p))
    assert snrs[0] > 25 and snrs[1] > 40 and snrs[2] > 55
    assert snrs[0] < snrs[1] < snrs[2]
    # real compression at every rate (vs 16-bit PCM)
    assert sizes[2] < 2 * len(sig) / 3
    assert sizes[0] < sizes[1] < sizes[2]
    # bitrate budget is honored as a ceiling (MPEG semantics), with
    # header+frame overhead the only excess; frame count follows the
    # encoder's pad-to-whole-frames block math
    blocks = -(-(len(sig) + 576) // 576)
    frames = (blocks + 1) // 2
    assert sizes[0] <= 64_000 * 1152 / 48000 / 8 * frames + 22 + 5 * frames


def test_psychoacoustic_allocation_masks_quiet_neighbor():
    """A -40 dB tone adjacent to a loud masker gets NO bits, while the
    same tone isolated in an otherwise-quiet signal gets coded: the
    spreading-function SMR is doing the allocating."""
    t = np.arange(1152)
    f_loud = (0 * 18 + 9) / 1152  # center of band 0 (normalized)
    f_quiet = (1 * 18 + 9) / 1152  # center of band 1, adjacent
    loud = np.sin(2 * np.pi * f_loud * t)
    quiet = 0.01 * np.sin(2 * np.pi * f_quiet * t)
    budget = 1500

    masked = _sb_analysis(loud + quiet)[:2]
    a_masked = _sb_allocate(_sb_smr(masked, 48000), budget)
    alone = _sb_analysis(quiet)[:2]
    a_alone = _sb_allocate(_sb_smr(alone, 48000), budget)
    assert a_alone[1] > 0  # isolated: audible above threshold in quiet
    # masked: the loud band dominates allocation; its band gets
    # strictly more levels than the masked neighbor
    assert a_masked[0] > a_masked[1]


def test_grouped_codeword_law_and_scf_table():
    # grouped classes pack 3 values into ceil(log2(n^3)) bits — the
    # 11172-3 Layer II widths (5/7/10 for 3/5/9 levels)
    for nlev, bits in _SB_GROUP_BITS.items():
        assert bits == math.ceil(math.log2(nlev**3))
        assert nlev in _SB_NLEVELS
    # scalefactor lattice: every third index halves the value
    for i in range(len(_SB_SCF) - 3):
        assert _SB_SCF[i + 3] == pytest.approx(_SB_SCF[i] / 2)
    # tightest-cover property of the index search
    for v in (3.9, 1.0, 0.1, 1e-6, 0.0):
        i = _sb_scf_index(v)
        assert _SB_SCF[i] >= v or i == 0
        if i + 1 < len(_SB_SCF) and v > 0:
            assert _SB_SCF[i + 1] < v or _SB_SCF[i] >= v


def test_structural_damage_returns_none():
    t = np.arange(4000)
    sig = (9000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    p = encode_subband(8000, sig, kbps=96)
    assert decode_subband(p) is not None
    # catalog corruption classes: 60% truncation, destroyed magic
    assert decode_subband(p[: len(p) * 3 // 5]) is None
    assert decode_subband(b"\x00\x00" + p) is None
    # flipped byte inside a frame body: CRC-16 catches it
    bad = bytearray(p)
    bad[len(p) // 2] ^= 0xFF
    assert decode_subband(bytes(bad)) is None
    # header field damage: header CRC catches it
    bad2 = bytearray(p)
    bad2[9] ^= 0x01  # sample-rate byte
    assert decode_subband(bytes(bad2)) is None
    assert decode_subband(b"") is None
    assert decode_subband(p[:10]) is None


def test_fewer_frames_than_declared_is_rejected():
    x = np.full(3000, 5000, dtype=np.int16)
    p = encode_subband(1000, x, kbps=192)
    # chop the last whole frame (length-prefixed): stream must fail,
    # not return a short signal
    pos = 22
    spans = []
    while pos + 3 <= len(p):
        blen = int.from_bytes(p[pos : pos + 3], "big")
        spans.append((pos, pos + 5 + blen))
        pos += 5 + blen
    assert len(spans) >= 3
    assert decode_subband(p[: spans[-1][0]]) is None


def test_sample_audio_frames_subband_through_spark(spark):
    import pandas as pd

    docs = []
    for doc_id in range(6):
        c = 2000 + 1500 * doc_id
        x = np.full(2500, c, dtype=np.int16)
        p = encode_subband(1000, x, kbps=192)
        if doc_id == 4:
            p = p[: len(p) * 3 // 5]  # corrupt: dropped entirely
        docs.append((doc_id, p))
    df = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    out = sample_audio_frames(
        df, "doc_id", "payload", frame_ms=1000, decoder="subband"
    ).toPandas()
    assert set(out.doc_id) == {0, 1, 2, 3, 5}
    # 2500 samples @1000 Hz, 1000 ms frames -> 3 frames per doc
    assert (
        out.groupby("doc_id").frame_idx.count() == 3
    ).all()
    for _, r in out.iterrows():
        expected = 2000 + 1500 * r.doc_id
        assert abs(r.rms - expected) < 2.0
    assert (out.frame_offset_ms == out.frame_idx * 1000).all()


def test_strict_seam_still_raises(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame([(1, b"x")], columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception):
        sample_audio_frames(
            df, "doc_id", "payload", decoder="strict"
        ).collect()


def test_prefix_decode_bounds_work_not_validation():
    """max_ms: the sampler's prefix discipline — prefix equals the
    full decode's prefix bit-for-bit, frames past the overlap region
    are CRC-walked but never parsed, and damage ANYWHERE in the
    stream (even past the prefix) still fails the decode."""
    rng = np.random.default_rng(5)
    sig = rng.integers(-20000, 20000, 48000 * 4).astype(np.int16)
    p = encode_subband(48000, sig, kbps=128)
    full = decode_subband(p)
    pre = decode_subband(p, max_ms=500)
    assert full is not None and pre is not None
    assert len(pre[1]) == 24000
    assert np.array_equal(pre[1], full[1][:24000])
    # over-request clamps to the clip
    assert np.array_equal(decode_subband(p, max_ms=10**9)[1], full[1])
    # tail damage beyond the decoded prefix still fails
    assert decode_subband(p[:-3], max_ms=500) is None
    bad = bytearray(p)
    bad[-10] ^= 0xFF
    assert decode_subband(bytes(bad), max_ms=500) is None


def test_resample_pcm_laws():
    """Exact-rational linear resampler: constant signals are fixed
    points at ANY ratio, the identity ratio is the identity, the
    length law is floor(n*dst/src), and integer-math determinism means
    a sine up/down round trip reproduces the original exactly at 2x."""
    x = np.full(1000, -7312, dtype=np.int16)
    from sqlserver_pg_cdc_spark.operators.multimodal import resample_pcm

    for dst in (8000, 640, 1000, 44100, 3):
        y = resample_pcm(x, 1000, dst)
        assert len(y) == (1000 * dst) // 1000
        assert (y == -7312).all()
    t = np.arange(8000)
    s = (10000 * np.sin(2 * np.pi * 50 * t / 8000)).astype(np.int16)
    back = resample_pcm(resample_pcm(s, 8000, 16000), 16000, 8000)
    assert np.array_equal(back, s)
    assert len(resample_pcm(np.zeros(0, dtype=np.int16), 8000, 16000)) == 0


def test_resample_audio_through_spark(spark):
    """subband -> resample -> WAV chain: corrupt inputs surface as
    NULL-payload rows; the resampled WAV decodes at the target rate
    with the floor-law sample count."""
    import pandas as pd

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_wav_pcm16,
        resample_audio,
    )

    rows = []
    for doc_id in range(4):
        p = encode_subband(
            1000, np.full(1500, 4000 + doc_id, dtype=np.int16), kbps=192
        )
        if doc_id == 2:
            p = p[: len(p) // 2]
        rows.append((doc_id, p))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    out = {
        r["doc_id"]: r
        for r in resample_audio(
            df, "doc_id", "payload", 640, decoder="subband"
        ).collect()
    }
    assert out[2]["payload"] is None and out[2]["n_samples"] is None
    for doc_id in (0, 1, 3):
        r = out[doc_id]
        assert r["sample_rate"] == 640 and r["n_samples"] == 960
        rate, pcm = decode_wav_pcm16(bytes(r["payload"]))
        assert rate == 640 and len(pcm) == 960
        assert np.abs(pcm.astype(int) - (4000 + doc_id)).max() <= 2


def test_header_alloc_bomb_is_rejected_before_allocation():
    """Round-9 advice (medium): a 24-byte crafted payload with a valid
    header CRC and n_total=2^39 used to trigger a multi-terabyte
    np.zeros (uncaught MemoryError -> task failure). Every declared
    frame costs >= 5 payload bytes, so the physical bound rejects it
    up front; MemoryError is also caught as NULL-on-corrupt."""
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _SB_FRAME_SAMPLES,
        _SB_MAGIC,
        _crc16,
        _MsbWriter,
    )

    n_total = 1 << 39
    head = _MsbWriter()
    for bch in _SB_MAGIC:
        head.write(bch, 8)
    head.write(1, 8)
    head.write(8000, 32)
    head.write(n_total, 40)
    head.write(192, 16)
    head.write((n_total // _SB_FRAME_SAMPLES) + 1, 32)
    hb = bytes(head.out)
    crafted = hb + _crc16(hb[4:]).to_bytes(2, "big")
    assert len(crafted) == 22
    assert decode_subband(crafted) is None
    # padding the tail does not help: still far under 5 bytes/frame
    assert decode_subband(crafted + b"\x00" * 64) is None
