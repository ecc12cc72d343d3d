"""Perceptual image hash (phash_pixels / phash_images /
phash_near_pairs): cross-container dedup and visual near-dup.
Contracts: bit-determinism (fixed-point DCT — integer matmul, exact
order statistic), container invariance (same pixels -> same hash
through BMP/PNG/GIF re-encodes), separation vs stability (distinct
textures >= 20 Hamming apart, mild noise <= 6), the banded Hamming
join's pigeonhole recall, and the nullable-Int64 column discipline
(a 63-bit fingerprint through a float64 pandas column would lose its
low ~10 bits whenever a corrupt neighbor put a None in the batch)."""

import itertools

import numpy as np
import pytest

from sqlserver_pg_cdc_spark.operators.multimodal import (
    _bmp_pixels,
    _dct2_matrix,
    _png_pixels,
    encode_bmp,
    encode_gif,
    encode_png,
    phash_images,
    phash_near_pairs,
    phash_pixels,
)


def _rich(c: int) -> np.ndarray:
    """Texture with energy in every low-frequency DCT bin — the regime
    pHash is designed for (a smooth synthetic image leaves half the
    bins at zero and the median threshold becomes a coin flip)."""
    rng = np.random.default_rng(100 + c)
    grid = np.zeros((32, 32))
    grid[:8, :8] = rng.choice([-1.0, 1.0], (8, 8)) * (
        300.0 / (1 + np.add.outer(np.arange(8), np.arange(8)))
    )
    grid[0, 0] = 4096
    d32 = _dct2_matrix(32)
    g = np.clip(np.rint(d32.T @ grid @ d32), 0, 255)
    big = np.repeat(np.repeat(g, 2, axis=0), 2, axis=1).astype(np.uint8)
    return np.stack([big] * 3, axis=2)


def test_separation_stability_and_container_invariance():
    hs = [phash_pixels(_rich(c)) for c in range(7)]
    assert len(set(hs)) == 7
    assert min(
        bin(a ^ b).count("1") for a, b in itertools.combinations(hs, 2)
    ) >= 20
    # mild noise stays within the near-dup Hamming budget
    rng = np.random.default_rng(0)
    for c in range(3):
        base = _rich(c)
        v = np.clip(
            base.astype(int) + rng.integers(-2, 3, base.shape), 0, 255
        ).astype(np.uint8)
        assert bin(phash_pixels(v) ^ hs[c]).count("1") <= 6
    # container invariance: BMP and PNG re-encodes of the same pixels
    px = _rich(3)
    assert (
        phash_pixels(_png_pixels(encode_png(64, 64, px.tobytes())))
        == hs[3]
        == phash_pixels(
            _bmp_pixels(encode_bmp(64, 64, px[:, :, ::-1].tobytes()))
        )
    )


def test_fixed_point_is_order_and_thread_independent():
    """Same array, many repeats, interleaved with other content: the
    integer pipeline admits no call-order or BLAS-scheduling state."""
    base = _rich(1)
    want = phash_pixels(base)
    for c in (0, 2, 4, 6):
        phash_pixels(_rich(c))
        assert phash_pixels(base) == want
        assert phash_pixels(np.ascontiguousarray(base[::-1])[::-1]) == want


def test_phash_images_nullable_int64_regression(spark):
    """The 2^53 trap, pinned: a batch mixing corrupt (None) and valid
    rows must return bit-exact hashes — the original tuple-rows
    constructor inferred float64 and silently rounded the low ~10 bits
    of every hash that shared a batch with a corrupt neighbor."""
    import pandas as pd

    px = _rich(2)
    p = encode_png(64, 64, px.tobytes())
    want = phash_pixels(px)
    assert want > (1 << 53)  # the regression only bites above 2^53
    rows = [(0, p), (1, p[: len(p) // 2]), (2, p)]  # corrupt in-batch
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["phash"] for r in
           phash_images(df, "doc_id", "payload").collect()}
    assert got[1] is None
    assert got[0] == want and got[2] == want  # bit-exact, not float-rounded


def test_near_pairs_banded_recall(spark):
    import pandas as pd

    rng = np.random.default_rng(5)
    docs = []
    hashes = []
    for c in range(4):
        base = _rich(c)
        docs.append((c * 10, phash_pixels(base)))
        noisy = np.clip(
            base.astype(int) + rng.integers(-2, 3, base.shape), 0, 255
        ).astype(np.uint8)
        docs.append((c * 10 + 1, phash_pixels(noisy)))
    docs.append((99, None))  # undecodable: must drop before the join
    df = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "phash"]),
        "doc_id long, phash long",
    )
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in phash_near_pairs(df, max_hamming=6).collect()
    }
    # every base/noisy pair found (pigeonhole guarantees recall <= 6),
    # no cross-class pair, nothing touching the NULL row
    assert set(pairs) == {(c * 10, c * 10 + 1) for c in range(4)}
    assert all(h <= 6 for h in pairs.values())


def _tone(c: int, n: int = 4000) -> np.ndarray:
    t = np.arange(n)
    s = 6000 * np.sign(np.sin(2 * np.pi * t * (c + 2) / 128)) + 4000 * np.sign(
        np.sin(2 * np.pi * t * (2 * c + 5) / 512)
    )
    env = 1 + ((t * (c + 3)) // n)
    return np.clip((s.astype(np.int64) * env) // 4, -32767, 32767).astype(
        np.int16
    )


def test_audio_fingerprint_laws():
    """Acoustic fingerprint: distinct signals separate, containers
    collapse (WAV == FLAC == raw samples), mild noise stays inside the
    near-dup budget, call order is irrelevant (integer-exact), and
    sub-segment signals return None."""
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        afp_samples,
        decode_flac,
        decode_wav_pcm16,
        encode_flac,
        encode_wav_pcm16,
    )

    hs = [afp_samples(_tone(c)) for c in range(7)]
    assert len(set(hs)) == 7
    assert min(
        bin(a ^ b).count("1") for a, b in itertools.combinations(hs, 2)
    ) >= 8
    x = _tone(3)
    assert (
        afp_samples(decode_wav_pcm16(encode_wav_pcm16(8000, x))[1])
        == hs[3]
        == afp_samples(decode_flac(encode_flac(8000, x))[1])
    )
    rng = np.random.default_rng(1)
    noisy = np.clip(
        x.astype(int) + rng.integers(-50, 51, len(x)), -32768, 32767
    ).astype(np.int16)
    assert bin(afp_samples(noisy) ^ hs[3]).count("1") <= 6
    for c in (0, 2, 5):
        afp_samples(_tone(c))
        assert afp_samples(x) == hs[3]  # no call-order state
    assert afp_samples(np.zeros(10, dtype=np.int16)) is None


def test_audio_fingerprints_cross_container_through_spark(spark):
    import pandas as pd

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        audio_fingerprints,
        encode_flac,
        encode_wav_pcm16,
        phash_near_pairs,
    )

    rows = []
    for doc_id in range(5):
        x = _tone(doc_id % 2)
        p = encode_flac(8000, x) if doc_id % 2 else encode_wav_pcm16(8000, x)
        if doc_id == 4:
            p = p[: len(p) * 3 // 5]
        rows.append((doc_id, p))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["afp"] for r in
           audio_fingerprints(df, "doc_id", "payload").collect()}
    assert got[4] is None  # corrupt drops
    assert got[0] == got[2] and got[1] == got[3]  # class collapse
    assert got[0] != got[1]
    # the banded-join helper is fingerprint-agnostic: exact duplicates
    # pair at hamming 0
    fps = audio_fingerprints(df, "doc_id", "payload")
    pairs = {
        (r["a"], r["b"])
        for r in phash_near_pairs(
            fps, hash_col="afp", max_hamming=0
        ).collect()
    }
    assert pairs == {(0, 2), (1, 3)}


def test_vhash_frames_edge_cases():
    """Unit laws of the video fingerprint: empty -> None, sub-32px
    frames -> None (degenerate box grid), grayscale channel weighting,
    and determinism across call order (the fixed-point discipline)."""
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import vhash_frames

    assert vhash_frames([]) is None
    tiny = [np.zeros((8, 8, 3), dtype=np.uint8)]
    assert vhash_frames(tiny) is None
    rgb = [
        ((np.mgrid[0:32, 0:48][0] * 7 + f) % 256).astype(np.uint8)[
            :, :, None
        ].repeat(3, axis=2)
        for f in range(4)
    ]
    gray = [fr[:, :, :1] for fr in rgb]
    a = vhash_frames(rgb)
    b = vhash_frames(gray)  # 220x the single channel == luma of equal RGB
    assert a == b
    assert vhash_frames(list(reversed(rgb))) == a  # temporal SUM: order-free
    assert 0 <= a < (1 << 63)
