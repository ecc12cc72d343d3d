"""Multimodal (image/audio/video) column plumbing.

Convention: a modality is an opaque ``binary`` payload column plus a typed
metadata struct (``mime``, byte length, modality-specific fields). The
Spark-side machinery — schemas, partition-sized Arrow batches through
``mapInPandas``, byte-level featurization — is real and tested, and so
are the pure-Python codec families that need no image/audio library:
24-bpp BMP, 8-bit RGB/RGBA PNG (stdlib zlib + per-spec unfiltering),
baseline JFIF JPEG (canonical-Huffman entropy decode + IDCT), GIF
(LZW), MJPEG frame sampling (elementary stream AND the AVI/RIFF
container, demuxed by chunk walk), 16-bit PCM WAV, IMA ADPCM, FLAC
(Rice-coded lossless), and the LOSSY psychoacoustic subband family
(576-line MDCT + Layer-II-style quantization — the MP3 toolchain,
``encode_subband``/``decode_subband``). Formats that genuinely require
a codec library remain explicit stubs:

- with ``decoder="strict"`` the decode raises NotImplementedError,
  exactly where torchaudio/ffmpeg would be called (bit-interoperable
  MP3 — its Huffman/window binary tables — and compressed inter-frame
  video codecs);
- with ``decoder="fake"`` (default for tests) a deterministic fake
  derives plausible dimensions/duration from the payload hash, so the
  downstream plumbing (schema, batching, joins) can be exercised
  end-to-end and reproducibly.

Scale notes: payloads never pass through Python row-at-a-time — batches
arrive as Arrow buffers; featurization is numpy over the buffer. Batch
size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
for multi-MB payloads set it low (e.g. 64) to bound executor memory.
"""

from __future__ import annotations

import hashlib
import math
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_pixel", T.DoubleType(), True),
    ]
)

AUDIO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_offset_ms", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def binary_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Real (non-stub) byte-level features, all JVM expressions: length,
    content hash, head bytes. The cheap first-pass filter for corrupt /
    truncated / duplicate payloads before any codec runs."""
    p = F.col(payload_col)
    return df.select(
        F.col(id_col),
        F.length(p).alias("n_bytes"),
        F.md5(p).alias("payload_md5"),
        F.lower(F.hex(F.substring(p, 1, 8))).alias("head_hex"),
    )


def binary_features_sql(table: str, id_col: str, payload_expr: str) -> str:
    # DuckDB's md5 takes VARCHAR only; decode() is byte-preserving for the
    # UTF-8 payloads the oracle fixture synthesizes from text
    return f"""
SELECT {id_col},
       octet_length({payload_expr}) AS n_bytes,
       md5(decode({payload_expr})) AS payload_md5,
       lower(substr(hex({payload_expr}), 1, 16)) AS head_hex
FROM {table}
"""


def with_metadata(
    df: DataFrame, payload_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Attach the typed metadata struct; modality fields NULL until a
    decode pass fills them."""
    p = F.col(payload_col)
    return df.withColumn(
        "metadata",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(p).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _fake_dims(payload: bytes) -> tuple[int, int]:
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192  # deterministic 64..255


# ---------------------------------------------------------------------------
# Real pure-Python codecs (no library needed): 24-bpp BI_RGB BMP,
# 16-bit PCM WAV, and (below) 8-bit truecolor PNG and baseline JFIF
# JPEG. These make decode_images / sample_audio_frames REAL decoders —
# header parse, padding, inflate, unfilter, Huffman entropy decode,
# IDCT, pixel math — while formats needing an external codec library
# (MP3, H.264-class video codecs) stay behind decoder="strict".
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 24-bpp bottom-up BMP writer. ``pixels`` is
    ``height*width*3`` bytes in row-major top-down (row 0 first) BGR
    order; rows are written bottom-up with 4-byte padding, per the
    format."""
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"need {width * height * 3} pixel bytes, got {len(pixels)}"
        )
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        body += pixels[r * row_bytes : (r + 1) * row_bytes]
        body += b"\x00" * pad
    header_size = 14 + 40
    file_size = header_size + len(body)
    return (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, header_size)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
        )
        + bytes(body)
    )


def decode_bmp(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """Parse a 24-bpp uncompressed BMP: returns (width, height,
    channels, pixel_byte_sum, n_pixel_bytes), or None if the payload is
    not such a BMP (wrong magic, compressed, truncated). The sum is an
    exact integer so downstream means divide ONCE in float64 — the
    cross-engine hash-parity discipline (functions/canonical.py)."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        return None
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if width <= 0 or height_raw == 0 or bpp != 24 or compression != 0:
        return None
    height = abs(height_raw)  # negative = top-down; pixel math identical
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if len(payload) < data_offset + stride * height:
        return None  # truncated
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, :row_bytes]
    return width, height, 3, int(rows.sum(dtype=np.int64)), row_bytes * height


def encode_wav_pcm16(sample_rate: int, samples: "np.ndarray | list[int]") -> bytes:
    """Minimal mono 16-bit PCM WAV writer (RIFF + fmt + data)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def decode_wav_pcm16(payload: bytes) -> tuple[int, np.ndarray] | None:
    """Parse a mono 16-bit PCM WAV: returns (sample_rate, int16 sample
    array) or None if not such a WAV. Walks RIFF chunks, so extra
    chunks (LIST/INFO) before ``data`` are fine."""
    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, sample_rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            return None  # truncated chunk — reject, same as decode_bmp
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1:
                return None
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if sample_rate is None or data is None or bits != 16 or channels != 1:
        return None
    n = len(data) // 2
    return sample_rate, np.frombuffer(data, dtype="<i2", count=n)


# ---------------------------------------------------------------------------
# IMA ADPCM (WAV format tag 0x0011) — REAL compressed-audio codec, pure
# integer math per the public IMA/DVI spec: 4 bits per sample (4:1 vs
# PCM16), per-block predictor+step-index header, the standard 89-entry
# step table and 8-entry index-adjust table. Mono only (the corpus
# normalization shape). Closes the compressed-audio gap the way PNG/JPEG
# closed the image one; MP3 (psychoacoustic subband coding) remains the
# declared strict stub.
# ---------------------------------------------------------------------------

_ADPCM_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_ADPCM_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _adpcm_step(predictor: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM reconstruction step -> (new predictor, new index).
    Shared by encode (in-loop state tracking) and decode — spec section
    'ADPCM decompression'."""
    step = _ADPCM_STEPS[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        predictor -= diff
    else:
        predictor += diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _ADPCM_INDEX_ADJ[nibble & 7]))
    return predictor, index


def encode_wav_adpcm(
    sample_rate: int,
    samples: "np.ndarray | list[int]",
    samples_per_block: int = 505,
) -> bytes:
    """Mono IMA ADPCM WAV writer. Each block stores one PCM16 seed
    sample in its 4-byte header plus ``samples_per_block - 1`` 4-bit
    deltas (505 -> 256-byte blocks, the canonical layout). The final
    short block is nibble-padded with zeros; the fmt extension records
    samples_per_block so the decoder can drop the padding."""
    pcm = np.asarray(samples, dtype=np.int64)
    if samples_per_block < 2 or (samples_per_block - 1) % 2:
        raise ValueError("samples_per_block must be even + 1 (whole bytes)")
    block_align = 4 + (samples_per_block - 1) // 2
    blocks = bytearray()
    index = 0
    i = 0
    n = len(pcm)
    while i < n:
        chunk = pcm[i : i + samples_per_block]
        predictor = int(chunk[0])
        blocks += struct.pack("<hBB", predictor, index, 0)
        nibbles = []
        for s in chunk[1:]:
            step = _ADPCM_STEPS[index]
            delta = int(s) - predictor
            nib = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            predictor, index = _adpcm_step(predictor, index, nib)
            nibbles.append(nib)
        nibbles += [0] * ((samples_per_block - 1) - len(nibbles))  # pad
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            blocks.append(lo | (hi << 4))  # low nibble first, per spec
        i += samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011, 1, sample_rate,
        sample_rate * block_align // samples_per_block,  # nominal byte rate
        block_align, 4,
        2,  # cbSize
        samples_per_block,
    )
    data = bytes(blocks)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data) + 12)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, n)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_adpcm(payload: bytes) -> tuple[int, np.ndarray] | None:
    """Parse a mono IMA ADPCM WAV: (sample_rate, int16 samples) or None
    on corruption / other formats. Per-block reconstruction from the
    header predictor + step index; the fact chunk (or samples-per-block
    arithmetic) bounds the final short block."""
    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, rate, spb, align, data, total = 12, None, None, None, None, None
    channels = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            return None
        if cid == b"fmt " and len(body) >= 20:
            tag, channels, rate, _, align, bits, _, spb = struct.unpack_from(
                "<HHIIHHHH", body, 0
            )
            if tag != 0x0011 or bits != 4:
                return None
        elif cid == b"fact" and len(body) >= 4:
            (total,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if rate is None or data is None or channels != 1 or not spb or not align:
        return None
    if align != 4 + (spb - 1) // 2 or len(data) % align:
        return None
    out = []
    zero_body = b"\x00" * (align - 4)
    for b0 in range(0, len(data), align):
        block = data[b0 : b0 + align]
        predictor, index, _ = struct.unpack_from("<hBB", block, 0)
        if index > 88:
            return None
        body = block[4:]
        # zero-run fast path: at step index 0 the nibble-0 delta is
        # step>>3 == 0, so an all-zero body (silence / constant hold)
        # reconstructs to the seed predictor for the whole block with
        # the index pinned at 0 — no per-nibble loop
        if index == 0 and body == zero_body:
            out.extend([predictor] * (1 + 2 * len(body)))
            continue
        out.append(predictor)
        for byte in body:
            for nib in (byte & 0xF, byte >> 4):
                predictor, index = _adpcm_step(predictor, index, nib)
                out.append(predictor)
    if total is not None:
        if total > len(out):
            return None  # fact claims more samples than the data holds
        out = out[:total]
    return rate, np.asarray(out, dtype=np.int16)


# ---------------------------------------------------------------------------
# FLAC: real Rice-coded LOSSLESS audio, from scratch (the sixth compression
# family: DEFLATE, DCT+Huffman, LZW, ADPCM, MJPEG, now Rice/linear
# prediction). Scope — the native-FLAC shape of mono 16-bit streams:
# encoder emits CONSTANT / VERBATIM / FIXED(0-2) subframes with
# single-partition Rice residuals; the decoder additionally handles FIXED
# orders 3-4, LPC orders 1-32, multi-partition Rice (methods 0 and 1,
# escape partitions), wasted bits, and validates CRC-8 (header), CRC-16
# (frame), and the STREAMINFO MD5 of the raw samples — so any corruption
# (truncation, bit flips, short streams) returns None deterministically.
# Reference spec: RFC 9639. Lossless round-trip (encode->decode == input
# exactly) is the correctness anchor, property-tested over random signals.
# ---------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame headers."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


_CRC16_TABLE = None


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — FLAC frames.
    Table-driven (256-entry, built once): the bit-at-a-time loop was
    the hot spot of every CRC-framed codec decode at bench scale."""
    global _CRC16_TABLE
    if _CRC16_TABLE is None:
        tbl = []
        for b in range(256):
            crc = b << 8
            for _ in range(8):
                crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            tbl.append(crc)
        _CRC16_TABLE = tbl
    crc = 0
    tbl = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ tbl[((crc >> 8) ^ b) & 0xFF]
    return crc


class _MsbWriter:
    """MSB-first bit accumulator (FLAC bit order)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def write_bit_array(self, bits: "np.ndarray") -> None:
        """Bulk-append a 0/1 uint8 bit array (numpy packbits fast path
        for vectorized Rice streams)."""
        nb = self.nbits
        if nb:
            acc_bits = np.array(
                [(self.acc >> (nb - 1 - i)) & 1 for i in range(nb)], dtype=np.uint8
            )
            bits = np.concatenate([acc_bits, bits])
            self.acc = 0
            self.nbits = 0
        n_full = (len(bits) // 8) * 8
        if n_full:
            self.out += np.packbits(bits[:n_full]).tobytes()
        for b in bits[n_full:]:
            self.acc = (self.acc << 1) | int(b)
            self.nbits += 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


class _MsbReader:
    """MSB-first bit reader; every read raises EOFError past the end —
    truncation detection is exact."""

    __slots__ = ("buf", "pos", "total", "_bits", "_ones", "_ones_list", "_padbuf")

    def __init__(self, data: bytes, start: int = 0):
        self.buf = data
        self.pos = start * 8
        self.total = len(data) * 8
        self._bits = None
        self._ones = None
        self._ones_list = None
        self._padbuf = None

    def bit_view(self) -> "tuple[np.ndarray, np.ndarray]":
        """(bits, ones-positions) over the whole buffer, built once —
        the vectorized Rice decode path."""
        if self._bits is None:
            self._bits = np.unpackbits(np.frombuffer(self.buf, dtype=np.uint8))
            self._ones = np.flatnonzero(self._bits)
        return self._bits, self._ones

    def read(self, n: int) -> int:
        if self.pos + n > self.total:
            raise EOFError
        v = 0
        pos = self.pos
        buf = self.buf
        while n:
            byte_i, bit_i = pos >> 3, pos & 7
            take = min(n, 8 - bit_i)
            chunk = (buf[byte_i] >> (8 - bit_i - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            pos += take
            n -= take
        self.pos = pos
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


_FLAC_FIXED_COEFS = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]]


def _flac_utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coding of frame/sample numbers."""
    if n < 0x80:
        return bytes([n])
    out = []
    prefix_bits = 0x3F
    n_bytes = 1
    while n > prefix_bits:
        out.append(0x80 | (n & 0x3F))
        n >>= 6
        n_bytes += 1
        prefix_bits >>= 1
    lead = (0xFF << (8 - n_bytes)) & 0xFF | n
    return bytes([lead] + out[::-1])


def _flac_read_utf8_number(r: _MsbReader) -> int | None:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n_bytes = 0
    mask = 0x80
    while b0 & mask:
        n_bytes += 1
        mask >>= 1
    if n_bytes < 2 or n_bytes > 7:
        return None
    v = b0 & (0x7F >> n_bytes)
    for _ in range(n_bytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            return None
        v = (v << 6) | (b & 0x3F)
    return v


def _rice_cost(residuals: "np.ndarray", k: int) -> int:
    u = (residuals.astype(np.int64) << 1) ^ (residuals.astype(np.int64) >> 63)
    return int(np.sum((u >> k) + 1 + k))


def _signed_bit_width(residuals: "np.ndarray") -> int:
    """Smallest two's-complement width holding every residual
    (-2^(w-1) <= r < 2^(w-1)). The caller must reject widths above the
    5-bit escape field's max of 31 (int16 input at FIXED order <= 2
    never exceeds 18)."""
    mn, mx = int(residuals.min()), int(residuals.max())
    return max(
        mx.bit_length() + 1 if mx > 0 else 1,
        (-mn - 1).bit_length() + 1 if mn < 0 else 1,
    )


def _rice_encode_bits(u: "np.ndarray", k: int) -> "np.ndarray":
    """Vectorized Rice stream for one partition: 0/1 uint8 bit array of
    every code (q zeros, a one, k low bits) — no per-sample Python."""
    q = (u >> k).astype(np.int64)
    lens = q + 1 + k
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    bits = np.zeros(int(lens.sum()), dtype=np.uint8)
    term = starts + q
    bits[term] = 1
    if k:
        shifts = np.arange(k - 1, -1, -1, dtype=np.int64)
        idx = (term[:, None] + 1 + np.arange(k)[None, :]).ravel()
        bits[idx] = ((u[:, None] >> shifts[None, :]) & 1).astype(np.uint8).ravel()
    return bits


def _rice_decode_block(r: _MsbReader, count: int, k: int) -> "np.ndarray":
    """Fast Rice decode of one partition: a ones-position index is
    built once per payload; per code the terminator bit is found by
    bisect (field bits may themselves contain ones, so the scan cannot
    be fully closed-form) and the k-bit field read from a 4-byte window
    — a few O(1) int ops per sample instead of per-bit Python reads."""
    import bisect as _bisect

    _, ones_arr = r.bit_view()
    ones = r._ones_list
    if ones is None:
        ones = r._ones_list = ones_arr.tolist()
    buf = r._padbuf
    if buf is None:
        buf = r._padbuf = bytes(r.buf) + b"\x00\x00\x00\x00"
    mask = (1 << k) - 1
    n_ones = len(ones)
    out = [0] * count
    pos = r.pos
    total = r.total
    oi = _bisect.bisect_left(ones, pos)
    for i in range(count):
        if oi >= n_ones:
            raise EOFError
        t = ones[oi]
        u = (t - pos) << k
        pos = t + 1 + k
        if pos > total:
            raise EOFError
        if k:
            f = t + 1
            bi = f >> 3
            window = int.from_bytes(buf[bi : bi + 4], "big")
            u |= (window >> (32 - (f & 7) - k)) & mask
        out[i] = (u >> 1) ^ -(u & 1)
        oi = _bisect.bisect_left(ones, pos, oi + 1)
    r.pos = pos
    return np.array(out, dtype=np.int64)


def encode_flac(sample_rate: int, samples: "np.ndarray | list[int]",
                block_size: int = 4096) -> bytes:
    """Mono 16-bit FLAC encode: STREAMINFO (with the raw-sample MD5) +
    fixed-blocksize frames. Per block the best of CONSTANT / FIXED
    order 0-2 (single-partition Rice, best 4-bit parameter, escape to
    verbatim residuals when cheaper) / VERBATIM is chosen by exact bit
    cost — a REAL encoder whose output any conforming FLAC decoder
    plays, and losslessness is the tested contract."""
    import hashlib

    x = np.asarray(samples, dtype=np.int16)
    n_total = len(x)
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()
    # STREAMINFO: min/max blocksize, min/max framesize (0 = unknown),
    # 20-bit rate, 3-bit channels-1, 5-bit bps-1, 36-bit total samples
    info = _MsbWriter()
    bs = min(block_size, max(16, n_total)) if n_total else 16
    info.write(bs, 16)
    info.write(bs, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(0, 3)
    info.write(15, 5)
    info.write(n_total, 36)
    body = bytes(info.out) + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last block
    xi = x.astype(np.int64)
    for frame_no, start in enumerate(range(0, n_total, bs) or [0]):
        blk = xi[start : start + bs]
        nb = len(blk)
        if nb == 0:
            break
        hdr = _MsbWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)   # reserved
        hdr.write(0, 1)   # fixed-blocksize stream
        hdr.write(0b0111, 4)  # 16-bit blocksize-1 follows
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(0b0000, 4)  # mono
        hdr.write(0b100, 3)   # 16 bps
        hdr.write(0, 1)       # reserved
        for b in _flac_utf8_number(frame_no):
            hdr.write(b, 8)
        hdr.write(nb - 1, 16)
        hdr_bytes = bytes(hdr.out)
        frame = _MsbWriter()
        for b in hdr_bytes:
            frame.write(b, 8)
        frame.write(_crc8(hdr_bytes), 8)
        # choose the cheapest subframe form by exact bit cost; residual
        # coding per order is the cheaper of best-k Rice and the escape
        # partition (raw signed values at their actual bit width — FIXED
        # order-1/2 residuals of int16 input can need up to 18 bits, so
        # the width is derived from the residual range, never assumed 16)
        best = ("verbatim", None, None, 16 * nb)
        if np.all(blk == blk[0]):
            best = ("constant", None, None, 16)
        else:
            for order in (0, 1, 2):
                if nb <= order:
                    continue
                res = blk.copy()
                for _ in range(order):
                    res = np.diff(res)
                ks = [(k, _rice_cost(res, k)) for k in range(15)]
                k, cost = min(ks, key=lambda t: t[1])
                coding = ("rice", k)
                width = _signed_bit_width(res)
                esc_cost = 5 + width * len(res)  # 5-bit raw width + values
                if width <= 31 and esc_cost < cost:
                    cost, coding = esc_cost, ("esc", width)
                cost += 16 * order + 2 + 4 + 4  # warmup + method + partorder + param
                if cost < best[3]:
                    best = ("fixed", order, (coding, res), cost)
        kind = best[0]
        if kind == "constant":
            frame.write(0b000000, 6 + 1)  # pad bit 0 + type CONSTANT
            frame.write(0, 1)             # no wasted bits
            frame.write(int(blk[0]) & 0xFFFF, 16)
        elif kind == "verbatim":
            frame.write(0b000001, 7)
            frame.write(0, 1)
            for v in blk:
                frame.write(int(v) & 0xFFFF, 16)
        else:
            order = best[1]
            (method, param), res = best[2]
            frame.write(0b001000 | order, 7)
            frame.write(0, 1)
            for v in blk[:order]:
                frame.write(int(v) & 0xFFFF, 16)
            frame.write(0b00, 2)  # rice method 0 (4-bit params)
            frame.write(0, 4)     # partition order 0
            if method == "esc":
                frame.write(0b1111, 4)   # escape partition
                frame.write(param, 5)    # raw bit width (from residual range)
                mask = (1 << param) - 1
                for v in res:
                    frame.write(int(v) & mask, param)
            else:
                u = (res << 1) ^ (res >> 63)
                frame.write(param, 4)
                frame.write_bit_array(_rice_encode_bits(u.astype(np.int64), param))
        frame.align()
        fb = bytes(frame.out)
        out += fb + _crc16(fb).to_bytes(2, "big")
    return bytes(out)


def decode_flac(payload: bytes) -> "tuple[int, np.ndarray] | None":
    """Mono 16-bit FLAC decode: (sample_rate, int16 samples) or None on
    ANY corruption — bad magic/metadata, CRC-8/CRC-16 mismatch, MD5
    mismatch, malformed coding, or truncation (exact: every bit read is
    bounds-checked). Subframe coverage beyond what the encoder emits:
    FIXED 0-4, LPC 1-32, Rice methods 0/1, multi-partition residuals,
    escape partitions, wasted bits."""
    import hashlib

    if payload is None or len(payload) < 42 or payload[:4] != b"fLaC":
        return None
    try:
        pos = 4
        rate = bps = n_total = None
        md5 = None
        while True:
            if pos + 4 > len(payload):
                return None
            hdr = payload[pos]
            size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
            body = payload[pos + 4 : pos + 4 + size]
            if len(body) < size:
                return None
            if hdr & 0x7F == 0:  # STREAMINFO
                if size != 34:
                    return None
                r = _MsbReader(body)
                r.read(16); r.read(16); r.read(24); r.read(24)
                rate = r.read(20)
                if r.read(3) != 0:  # mono only
                    return None
                bps = r.read(5) + 1
                if bps != 16:
                    return None
                n_total = r.read(36)
                md5 = body[18:34]
            pos += 4 + size
            if hdr & 0x80:
                break
        if rate is None or rate == 0:
            return None
        out = np.empty(n_total, dtype=np.int64)
        got = 0
        r = _MsbReader(payload, pos)
        while got < n_total:
            frame_start = r.byte_pos()
            if r.read(14) != 0b11111111111110 or r.read(1):
                return None
            r.read(1)  # blocking strategy
            bs_code = r.read(4)
            sr_code = r.read(4)
            chan = r.read(4)
            if chan != 0:  # mono streams only
                return None
            size_code = r.read(3)
            if size_code not in (0b100, 0b000):  # 16-bit (or from STREAMINFO)
                return None
            if r.read(1):
                return None
            if _flac_read_utf8_number(r) is None:
                return None
            if bs_code == 0b0110:
                nb = r.read(8) + 1
            elif bs_code == 0b0111:
                nb = r.read(16) + 1
            elif bs_code == 0b0001:
                nb = 192
            elif 0b0010 <= bs_code <= 0b0101:
                nb = 576 << (bs_code - 2)
            elif bs_code >= 0b1000:
                nb = 256 << (bs_code - 8)
            else:
                return None
            if sr_code == 0b1100:
                r.read(8)
            elif sr_code in (0b1101, 0b1110):
                r.read(16)
            elif sr_code == 0b1111:
                return None
            hdr_crc = r.read(8)
            if _crc8(payload[frame_start : r.byte_pos() - 1]) != hdr_crc:
                return None
            if got + nb > n_total:
                return None
            blk = _flac_decode_subframe(r, nb)
            if blk is None:
                return None
            r.align()
            crc = r.read(16)
            if _crc16(payload[frame_start : r.byte_pos() - 2]) != crc:
                return None
            out[got : got + nb] = blk
            got += nb
        if np.any(out > 32767) or np.any(out < -32768):
            return None
        x = out.astype(np.int16)
        if md5 and md5 != b"\x00" * 16:
            if hashlib.md5(x.astype("<i2").tobytes()).digest() != md5:
                return None
        return rate, x
    except EOFError:
        return None


def _flac_decode_subframe(r: _MsbReader, nb: int) -> "np.ndarray | None":
    if r.read(1):
        return None
    typ = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    bps = 16 - wasted
    if typ == 0:  # CONSTANT
        blk = np.full(nb, r.read_signed(bps), dtype=np.int64)
    elif typ == 1:  # VERBATIM
        blk = np.array([r.read_signed(bps) for _ in range(nb)], dtype=np.int64)
    elif 8 <= typ <= 12:  # FIXED order 0-4
        order = typ - 8
        if order > nb:
            return None
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _flac_read_residual(r, nb, order)
        if res is None:
            return None
        blk = np.empty(nb, dtype=np.int64)
        blk[:order] = warm
        if order == 0:
            blk = res
        else:
            # invert the order-th difference by repeated cumsum, each
            # level seeded from the warmup samples' difference chain —
            # exact int64 math, no per-sample Python
            seq = res
            w = np.asarray(warm, dtype=np.int64)
            for j in range(order, 0, -1):
                init = np.diff(w, n=j - 1)[-1]
                seq = np.concatenate(([init], seq)).cumsum()[1:]
            blk[order:] = seq
    elif typ >= 32:  # LPC
        order = (typ & 31) + 1
        if order > nb:
            return None
        warm = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4)
        if prec == 15:
            return None
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            return None
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _flac_read_residual(r, nb, order)
        if res is None:
            return None
        blk = np.empty(nb, dtype=np.int64)
        blk[:order] = warm
        for i in range(order, nb):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * blk[i - 1 - j]
            blk[i] = res[i - order] + (acc >> shift)
    else:
        return None
    return blk << wasted if wasted else blk


def _flac_read_residual(r: _MsbReader, nb: int, order: int) -> "np.ndarray | None":
    method = r.read(2)
    if method > 1:
        return None
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if nb % n_parts:
        return None
    out = np.empty(nb - order, dtype=np.int64)
    w = 0
    for p in range(n_parts):
        count = (nb >> part_order) - (order if p == 0 else 0)
        if count < 0:
            return None
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            for _ in range(count):
                out[w] = r.read_signed(raw) if raw else 0
                w += 1
        else:
            out[w : w + count] = _rice_decode_block(r, count, k)
            w += count
    return out


# ---------------------------------------------------------------------------
# PNG: the first COMPRESSED format with a real pure-Python codec. Everything
# needed is stdlib: zlib for inflate/deflate + crc32; the scanline filters
# (None/Sub/Up/Average/Paeth) are implemented per the PNG spec (RFC 2083
# §6). Scope: 8-bit truecolor RGB / RGBA, non-interlaced — the shape
# training-data image payloads overwhelmingly take after normalization.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/up-left to
    the linear estimate a + b - c, ties resolved left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    filters: "list[int] | None" = None,
) -> bytes:
    """Minimal 8-bit truecolor PNG writer. ``pixels`` is row-major
    top-down, ``width*height*channels`` bytes (channels 3=RGB, 4=RGBA).
    ``filters`` gives the per-row filter type; the default ``row % 5``
    deliberately cycles through every filter so a decoder must implement
    all of None/Sub/Up/Average/Paeth to round-trip a fixture."""
    if channels not in (3, 4):
        raise ValueError("channels must be 3 (RGB) or 4 (RGBA)")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"need {width * height * channels} pixel bytes, got {len(pixels)}"
        )
    bpp = channels
    stride = width * bpp
    out = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = pixels[r * stride : (r + 1) * stride]
        f = (filters[r] if filters is not None else r) % 5
        out.append(f)
        if f == 0:
            out += row
        elif f == 1:  # Sub
            out += bytes(
                (row[x] - (row[x - bpp] if x >= bpp else 0)) & 0xFF
                for x in range(stride)
            )
        elif f == 2:  # Up
            out += bytes((row[x] - prev[x]) & 0xFF for x in range(stride))
        elif f == 3:  # Average
            out += bytes(
                (row[x] - (((row[x - bpp] if x >= bpp else 0) + prev[x]) >> 1))
                & 0xFF
                for x in range(stride)
            )
        else:  # Paeth
            out += bytes(
                (
                    row[x]
                    - _paeth(
                        row[x - bpp] if x >= bpp else 0,
                        prev[x],
                        prev[x - bpp] if x >= bpp else 0,
                    )
                )
                & 0xFF
                for x in range(stride)
            )
        prev = row
    color_type = 2 if channels == 3 else 6
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """Parse an 8-bit truecolor (RGB/RGBA) non-interlaced PNG: returns
    (width, height, channels, pixel_byte_sum, n_pixel_bytes) — the same
    tuple shape as :func:`decode_bmp` — or None for anything that is not
    such a PNG (bad magic, unsupported IHDR, CRC mismatch, truncated or
    corrupt deflate stream, wrong scanline length, unknown filter type).
    Walks chunks, so ancillary chunks (tEXt, pHYs, ...) and IDAT split
    across multiple chunks are handled; every chunk CRC is verified."""
    px = _png_pixels(payload)
    if px is None:
        return None
    h, w, c = px.shape
    return w, h, c, int(px.astype(np.int64).sum()), w * h * c


def _png_pixels(payload: bytes) -> "np.ndarray | None":
    """Full-pixel variant of :func:`decode_png`: (H, W, C) uint8 array
    (C = 3 or 4), or None on any corruption — same validation, same
    bounded-inflate zip-bomb guard. The resize path's PNG entry."""
    if payload is None or len(payload) < len(_PNG_SIG) + 12:
        return None
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        return None
    pos = len(_PNG_SIG)
    width = height = channels = None
    idat = bytearray()
    seen_end = False
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + length > len(payload):
            return None  # truncated chunk
        typ = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            return None  # corrupt chunk
        if typ == b"IHDR":
            if length != 13:
                return None
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if (
                depth != 8
                or color_type not in (2, 6)
                or comp != 0
                or filt != 0
                or interlace != 0
                or width <= 0
                or height <= 0
            ):
                return None  # out of supported scope
            channels = 3 if color_type == 2 else 4
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if width is None or channels is None or not idat or not seen_end:
        return None
    bpp = channels
    stride = width * bpp
    expected = (stride + 1) * height
    # bounded inflate: the expected output size is fully determined by
    # the already-validated IHDR, so cap decompression at expected+1
    # bytes — a crafted tiny payload (zip bomb) in this documented
    # untrusted-input path is rejected without ever allocating its
    # claimed gigabytes
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error:
        return None
    if len(raw) != expected or not dec.eof:
        return None
    # numpy-vectorized unfiltering (the per-byte pure-Python loops were
    # O(width*height*channels) interpreter ops per image): None/Up/Sub
    # reconstruct as whole-row array ops (Sub is a per-channel cumulative
    # sum — mod-256 arithmetic distributes over the prefix sum); the
    # sequentially-dependent Average/Paeth rows fall back to a per-PIXEL
    # loop with the channel math vectorized (bpp-wide ops, width
    # iterations instead of width*channels)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = arr[:, 0]
    if (filters > 4).any():
        return None  # unknown filter type
    data = arr[:, 1:]
    prev = np.zeros(stride, dtype=np.int64)
    out = np.empty((height, stride), dtype=np.uint8)
    for r in range(height):
        f = int(filters[r])
        row = data[r].astype(np.int64)
        if f == 0:
            line = row
        elif f == 1:  # Sub: out[i] = raw[i] + out[i-bpp]  => channel cumsum
            line = np.cumsum(row.reshape(-1, bpp), axis=0).reshape(-1) & 0xFF
        elif f == 2:  # Up
            line = (row + prev) & 0xFF
        elif f == 3:  # Average
            line = np.empty(stride, dtype=np.int64)
            px = row.reshape(-1, bpp)
            pv = prev.reshape(-1, bpp)
            left = np.zeros(bpp, dtype=np.int64)
            for i in range(width):
                left = (px[i] + ((left + pv[i]) >> 1)) & 0xFF
                line[i * bpp : (i + 1) * bpp] = left
        else:  # Paeth
            line = np.empty(stride, dtype=np.int64)
            px = row.reshape(-1, bpp)
            pv = prev.reshape(-1, bpp)
            left = np.zeros(bpp, dtype=np.int64)
            upleft = np.zeros(bpp, dtype=np.int64)
            for i in range(width):
                up = pv[i]
                p = left + up - upleft
                pa = np.abs(p - left)
                pb = np.abs(p - up)
                pc = np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                left = (px[i] + pred) & 0xFF
                line[i * bpp : (i + 1) * bpp] = left
                upleft = up
        out[r] = line & 0xFF
        prev = line
    return out.reshape(height, width, bpp)


# ---------------------------------------------------------------------------
# GIF (87a/89a) — REAL LZW-compressed decode, no image library; the
# third compression family after DEFLATE (PNG) and DCT+Huffman (JPEG).
# Header + logical screen descriptor + global/local color tables,
# extension-block skipping, sub-block reassembly, LSB-first variable-
# width LZW code stream with clear/EOI handling and 4096-entry
# dictionary growth. Scope: first image frame, non-interlaced, 8-bit
# palettes — the shape scraped web GIFs normalize to. Lossless, so the
# sibling encoder round-trips pixels bit-exactly (unlike JPEG no
# constant-color trick is needed for the oracle).
# ---------------------------------------------------------------------------


def encode_gif(
    width: int, height: int, palette: list[tuple[int, int, int]], indexes: bytes
) -> bytes:
    """GIF89a writer: one non-interlaced frame over a global color
    table, real LZW compression (variable code width, clear-code resets
    at dictionary capacity)."""
    if len(indexes) != width * height:
        raise ValueError("index buffer size mismatch")
    if not 1 <= len(palette) <= 256:
        raise ValueError("palette must have 1..256 entries")
    bits = max(1, (len(palette) - 1).bit_length())
    gct_size = 1 << bits
    if any(i >= len(palette) for i in indexes):
        raise ValueError("index out of palette range")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    for i in range(gct_size):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    min_code = max(2, bits)
    out.append(min_code)
    clear, eoi = 1 << min_code, (1 << min_code) + 1

    # single-pass LZW: slot counter and code width advance together;
    # width grows when the NEXT slot to assign would not fit (the GIF
    # convention — validated against an independent browser decoder)
    packed = bytearray()
    state = {"acc": 0, "nbits": 0, "width": min_code + 1}

    def emit(code: int) -> None:
        state["acc"] |= code << state["nbits"]
        state["nbits"] += state["width"]
        while state["nbits"] >= 8:
            packed.append(state["acc"] & 0xFF)
            state["acc"] >>= 8
            state["nbits"] -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << min_code)}
    next_code = eoi + 1
    emit(clear)
    prefix = b""
    for px in indexes:
        cand = prefix + bytes([px])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << state["width"]) + 1 and state["width"] < 12:
                state["width"] += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(1 << min_code)}
            next_code = eoi + 1
            state["width"] = min_code + 1
        prefix = bytes([px])
    if prefix:
        emit(table[prefix])
        # the decoder's table LAGS the encoder's by one entry and
        # catches up on the final data code (it appends the entry for
        # the encoder's previous emit, which the encoder's final flush
        # never paired with an add). If that catch-up lands exactly on
        # 2^width, a conforming decoder widens BEFORE reading EOI —
        # mirror it, or the EOI is emitted one bit short and the stream
        # ends mid-code (Hypothesis example: 3x5, 3 colors, 15 px whose
        # final emit left next_code == 16 at width 4)
        if next_code == (1 << state["width"]) and state["width"] < 12:
            state["width"] += 1
    emit(eoi)
    if state["nbits"]:
        packed.append(state["acc"] & 0xFF)
    for i in range(0, len(packed), 255):
        chunk = packed[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """(width, height, 3, rgb_byte_sum, n_rgb_bytes) from the FIRST
    frame of a GIF87a/89a payload, or None on corruption or
    out-of-scope features. Full LZW decode with variable code width,
    clear/EOI, and the deferred-clear dictionary rule."""
    got = _gif_frame(payload)
    if got is None:
        return None
    idx2, rgb = got
    h, w = idx2.shape
    total = int(rgb[idx2.reshape(-1)].astype(np.int64).sum())
    return w, h, 3, total, w * h * 3


def _gif_frame(payload: bytes) -> "tuple[np.ndarray, np.ndarray] | None":
    """Full-pixel variant of :func:`decode_gif`: ((H, W) palette-index
    array, (N, 3) RGB palette), or None on corruption — same LZW
    validation. Interlaced frames are de-permuted into natural row
    order (the 4-pass 8/8/4/2 scheme), so pixel consumers see the
    image, not the wire order. The GIF entry of the resize path —
    resizing SAMPLES in index space, so the palette (and losslessness)
    survives re-encode."""
    if payload is None or len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        return None
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if pos + 3 * n > len(payload):
            return None
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer before any image
            return None
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            return None
        if pos + 10 > len(payload):
            return None
        _l, _t, width, height, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        interlaced = bool(ipacked & 0x40)
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            if pos + 3 * n > len(payload):
                return None
            pal = payload[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None or width == 0 or height == 0:
            return None
        if pos >= len(payload):
            return None
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            return None
        data = bytearray()
        while pos < len(payload):
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            if pos + sz > len(payload):
                return None
            data += payload[pos : pos + sz]
            pos += sz
        else:
            return None
        # ---- LZW decode (LSB-first variable width) ----
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        dict_init = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
        table = list(dict_init)
        width_bits = min_code + 1
        acc = nbits = 0
        di = 0
        prev: bytes | None = None
        out = bytearray()
        n_px = width * height
        while True:
            while nbits < width_bits:
                if di >= len(data):
                    return None  # ran out before EOI
                acc |= data[di] << nbits
                di += 1
                nbits += 8
            code = acc & ((1 << width_bits) - 1)
            acc >>= width_bits
            nbits -= width_bits
            if code == clear:
                table = list(dict_init)
                width_bits = min_code + 1
                prev = None
                continue
            if code == eoi:
                break
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            if len(table) == (1 << width_bits) and width_bits < 12:
                width_bits += 1
            if len(out) > n_px:
                return None  # stream longer than the frame
        if len(out) != n_px:
            return None
        idx = np.frombuffer(bytes(out), dtype=np.uint8)
        if int(idx.max()) * 3 + 2 >= len(pal):
            return None  # index beyond the palette
        rgb = np.frombuffer(pal, dtype=np.uint8)[: (len(pal) // 3) * 3].reshape(-1, 3)
        idx2 = idx.reshape(height, width)
        if interlaced:
            order = np.concatenate([
                np.arange(0, height, 8), np.arange(4, height, 8),
                np.arange(2, height, 4), np.arange(1, height, 2),
            ])
            nat = np.empty(height, dtype=np.int64)
            nat[order] = np.arange(height)
            idx2 = idx2[nat]
        return idx2, rgb
    return None


# ---------------------------------------------------------------------------
# JPEG (baseline JFIF) — REAL entropy-coded decode, no image library.
# Everything from public spec knowledge (ITU-T T.81 / JFIF 1.02): marker
# walk, DQT/DHT parsing with canonical Huffman reconstruction, SOF0
# frame header, SOS entropy scan with 0xFF00 byte unstuffing, DC
# differential + AC run-length decode, dequantization, inverse zigzag,
# 8x8 IDCT (numpy DCT-III matrix product), level shift, JFIF YCbCr->RGB.
# Scope: baseline sequential, 8-bit, 4:4:4 (no chroma subsampling),
# 1 or 3 components — the shape normalized training payloads take.
# The sibling encoder emits spec-compliant files the decoder (or any
# standard decoder) reads; canonical-Huffman DHT tables are built from
# the symbols actually emitted.
# ---------------------------------------------------------------------------

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# flat quant table (all 16): DC of a solid block with even gray level
# round-trips exactly — the property the analytic oracle rides on
_JPEG_QTABLE = [16] * 64

# canonical-Huffman table specs (bits-per-length + symbol list, the DHT
# wire format): DC categories 0..11 at 4 bits; AC = EOB + ZRL + the full
# baseline run/size plane (runs 0..15 x sizes 1..10, 162 symbols — the
# same symbol set as the standard Annex K tables) at 8 bits. k symbols
# of equal length L with k < 2^L is a valid canonical code (never
# exhausts the all-ones prefix).
_JPEG_DC_SYMS = list(range(12))
_JPEG_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _jpeg_huff_spec(symbols: list[int]) -> tuple[list[int], list[int]]:
    length = max(1, (len(symbols)).bit_length())
    if len(symbols) >= (1 << length):
        length += 1
    bits = [0] * 17
    bits[length] = len(symbols)
    return bits, symbols


def _jpeg_idct_matrix() -> "np.ndarray":
    m = np.zeros((8, 8))
    for k in range(8):
        c = math.sqrt(0.5) if k == 0 else 1.0
        for n in range(8):
            m[k, n] = 0.5 * c * math.cos((2 * n + 1) * k * math.pi / 16)
    return m


_IDCT_M = _jpeg_idct_matrix()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _huff_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _dht_segment(cls: int, tid: int, bits: list[int], symbols: list[int]) -> bytes:
    body = bytes([cls << 4 | tid]) + bytes(bits[1:17]) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _category(v: int) -> int:
    return abs(v).bit_length()


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encode of ``width*height*channels`` RGB (or gray)
    bytes: YCbCr convert, 8x8 DCT, flat quantization, canonical-Huffman
    entropy coding. A real, standard-decodable JPEG — used by the
    contract query with solid even-gray inputs (whose DC quantization
    round-trips exactly) and by tests with arbitrary content.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (byte-aligned scan, DC predictors reset, marker
    number cycling mod 8 per T.81 E.1.4) — exercises the decoder's
    restart resync path."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if channels == 3:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [arr[:, :, 0].astype(np.float64)]
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    q = np.array(_JPEG_QTABLE, dtype=np.float64)[np.argsort(_JPEG_ZIGZAG)].reshape(8, 8)
    dc_bits, dc_syms = _jpeg_huff_spec(_JPEG_DC_SYMS)
    ac_bits, ac_syms = _jpeg_huff_spec(_JPEG_AC_SYMS)
    dc_codes = _huff_codes(dc_bits, dc_syms)
    ac_codes = _huff_codes(ac_bits, ac_syms)
    writer = _BitWriter()
    prev_dc = [0] * len(planes)
    for by in range(bh):
        for bx in range(bw):
            mcu = by * bw + bx  # 1x1 sampling: one MCU per block
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()  # byte-align (pad bits are 1s per spec)
                writer.out += bytes(
                    [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]
                )
                prev_dc = [0] * len(planes)
            for ci, plane in enumerate(planes):
                # edge-replicated 8x8 block
                ys = np.clip(np.arange(by * 8, by * 8 + 8), 0, height - 1)
                xs = np.clip(np.arange(bx * 8, bx * 8 + 8), 0, width - 1)
                block = plane[np.ix_(ys, xs)] - 128.0
                coef = _IDCT_M @ block @ _IDCT_M.T  # forward DCT
                quant = np.round(coef / q).astype(np.int64)
                zz = quant.reshape(-1)[_JPEG_ZIGZAG]
                diff = int(zz[0]) - prev_dc[ci]
                prev_dc[ci] = int(zz[0])
                s = _category(diff)
                if s > 11:
                    raise ValueError("DC difference out of baseline range")
                code, ln = dc_codes[s]
                writer.write(code, ln)
                if s:
                    v = diff if diff > 0 else diff + (1 << s) - 1
                    writer.write(v, s)
                run = 0
                last_nz = max((i for i in range(1, 64) if zz[i] != 0), default=0)
                for i in range(1, last_nz + 1):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]  # ZRL
                        writer.write(code, ln)
                        run -= 16
                    s = _category(v)
                    sym = (run << 4) | s
                    if sym not in ac_codes:
                        raise ValueError(
                            f"AC symbol {sym:#x} outside the baseline "
                            "table (size > 10)"
                        )
                    code, ln = ac_codes[sym]
                    writer.write(code, ln)
                    bitsv = v if v > 0 else v + (1 << s) - 1
                    writer.write(bitsv, s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[0x00]  # EOB
                    writer.write(code, ln)
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    dqt = bytes([0x00]) + bytes(_JPEG_QTABLE)
    out += b"\xff\xdb" + struct.pack(">H", len(dqt) + 2) + dqt
    ncomp = len(planes)
    sof = bytearray(struct.pack(">BHHB", 8, height, width, ncomp))
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])  # 1x1 sampling, qtable 0
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _dht_segment(0, 0, dc_bits, dc_syms)
    out += _dht_segment(1, 0, ac_bits, ac_syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytearray([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + bytes(sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-scan bit reader: the stream is UNSTUFFED ONCE up front
    (0xFF00 -> 0xFF; RST0-7 markers are elided with their bit position
    and number recorded for :meth:`sync_restart`; stops at the first
    OTHER real marker), then reads are 16-bit window peeks over the
    flat buffer — no per-bit Python calls. Reads past the true bit
    count return None (truncation detection is exact; the 3-byte tail
    padding only serves the window arithmetic)."""

    __slots__ = ("buf", "pos", "total", "restarts", "_rst_i")

    def __init__(self, data: bytes):
        buf = bytearray()
        restarts: list[tuple[int, int]] = []
        i, n = 0, len(data)
        while i < n:
            b = data[i]
            if b == 0xFF:
                nxt = data[i + 1] if i + 1 < n else None
                if nxt == 0x00:
                    buf.append(0xFF)
                    i += 2
                    continue
                if nxt is not None and 0xD0 <= nxt <= 0xD7:
                    restarts.append((len(buf) * 8, nxt - 0xD0))
                    i += 2
                    continue
                break  # real marker (or dangling 0xFF)
            buf.append(b)
            i += 1
        self.total = len(buf) * 8
        self.buf = bytes(buf) + b"\x00\x00\x00"
        self.pos = 0
        self.restarts = restarts
        self._rst_i = 0

    def sync_restart(self, expected_n: int) -> bool:
        """Align onto the next recorded RSTn boundary: at most 7
        encoder padding bits may remain before it, and the marker
        number must follow the modulo-8 sequence (T.81 E.1.4) —
        anything else is a corrupt or desynchronized scan."""
        if self._rst_i >= len(self.restarts):
            return False
        mark_pos, n = self.restarts[self._rst_i]
        self._rst_i += 1
        if n != expected_n or self.pos > mark_pos or mark_pos - self.pos >= 8:
            return False
        self.pos = mark_pos
        return True

    def peek16(self) -> int:
        bp = self.pos >> 3
        off = self.pos & 7
        w = (self.buf[bp] << 16) | (self.buf[bp + 1] << 8) | self.buf[bp + 2]
        return (w >> (8 - off)) & 0xFFFF

    def read_bits(self, n: int) -> int | None:
        if self.pos + n > self.total:
            return None
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


def _huff_decode(reader: "_BitReader", table: dict[tuple[int, int], int]) -> int | None:
    # canonical codes are prefix-free, so matching at increasing lengths
    # over one 16-bit peek can never hit a wrong shorter entry
    peek = reader.peek16()
    avail = reader.total - reader.pos
    for length in range(1, 17):
        if length > avail:
            return None
        sym = table.get((length, peek >> (16 - length)))
        if sym is not None:
            reader.pos += length
            return sym
    return None


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """(width, height, channels, pixel_sum, n_pixel_bytes) from a
    baseline JFIF payload, or None on any corruption (truncation, bad
    marker structure, undefined Huffman code, scan underrun, RST
    sequence violation) or out-of-scope feature (progressive, 12-bit,
    chroma subsampling, arithmetic coding). Restart intervals (DRI +
    RST0-7, T.81 E.1.4) ARE in scope: DC predictors reset and the
    reader re-aligns at each marker. Pure Python + numpy: canonical
    Huffman decode, flat dequant, IDCT-III matrix product, JFIF color
    convert."""
    px = _jpeg_pixels(payload)
    if px is None:
        return None
    h, w, c = px.shape
    return w, h, c, int(px.astype(np.int64).sum()), w * h * c


def _jpeg_pixels(payload: bytes) -> "np.ndarray | None":
    """Full pixel decode of a baseline JFIF payload: top-down (H, W, C)
    uint8 RGB (or gray) array, or None under exactly the same corruption
    and scope rules as :func:`decode_jpeg` (which delegates here)."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qid)
    scan_comps: list[tuple[int, int, int]] = []  # (id, dc_tid, ac_tid)
    data_start = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            return None  # truncated segment
        if marker == 0xDB:  # DQT
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0xF
                if pq != 0 or len(b) < 65:
                    return None  # 12-bit tables out of scope
                qtables[tq] = list(b[1:65])
                b = b[65:]
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                return None
            precision, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8 or width == 0 or height == 0:
                return None
            if len(body) < 6 + 3 * ncomp:
                return None
            for i in range(ncomp):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    return None  # subsampling out of scope
                comps.append((cid, samp, qid))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # progressive / extended / arithmetic out of scope
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                if len(b) < 17:
                    return None
                cls, tid = b[0] >> 4, b[0] & 0xF
                bits = [0] + list(b[1:17])
                nsym = sum(bits)
                if len(b) < 17 + nsym:
                    return None
                symbols = list(b[17 : 17 + nsym])
                codes = _huff_codes(bits, symbols)
                htables[(cls, tid)] = {
                    (ln, code): sym for sym, (code, ln) in codes.items()
                }
                b = b[17 + nsym :]
        elif marker == 0xDD:  # DRI
            if len(body) != 2:
                return None
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if not comps or width is None:
                return None
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3 or ns != len(comps):
                return None
            for i in range(ns):
                cid = body[1 + 2 * i]
                tds = body[2 + 2 * i]
                scan_comps.append((cid, tds >> 4, tds & 0xF))
            data_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if data_start is None or width is None or not comps:
        return None
    for _, _, qid in comps:
        if qid not in qtables:
            return None
    for _, dc_t, ac_t in scan_comps:
        if (0, dc_t) not in htables or (1, ac_t) not in htables:
            return None
    end = payload.rfind(b"\xff\xd9")
    if end <= data_start:
        return None
    reader = _BitReader(payload[data_start:end])
    ncomp = len(comps)
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8)) for _ in range(ncomp)]
    prev_dc = [0] * ncomp
    inv_zz = np.argsort(_JPEG_ZIGZAG)
    comp_q = [np.array(qtables[comps[ci][2]], dtype=np.float64) for ci in range(ncomp)]
    for by in range(bh):
        for bx in range(bw):
            mcu = by * bw + bx  # 1x1 sampling: one MCU per block column
            if restart_interval and mcu and mcu % restart_interval == 0:
                if not reader.sync_restart((mcu // restart_interval - 1) % 8):
                    return None
                prev_dc = [0] * ncomp
            for ci in range(ncomp):
                _, dc_t, ac_t = scan_comps[ci]
                q = comp_q[ci]
                sym = _huff_decode(reader, htables[(0, dc_t)])
                if sym is None or sym > 11:
                    return None
                if sym:
                    v = reader.read_bits(sym)
                    if v is None:
                        return None
                    diff = _extend(v, sym)
                else:
                    diff = 0
                prev_dc[ci] += diff
                zz = np.zeros(64)
                zz[0] = prev_dc[ci]
                k = 1
                any_ac = False
                while k < 64:
                    sym = _huff_decode(reader, htables[(1, ac_t)])
                    if sym is None:
                        return None
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63 or size == 0:
                        return None
                    v = reader.read_bits(size)
                    if v is None:
                        return None
                    zz[k] = _extend(v, size)
                    any_ac = True
                    k += 1
                if not any_ac:
                    # DC-only block: the IDCT of a lone DC coefficient is
                    # a constant plane DC/8 — the standard decoder fast
                    # path; skips two 8x8 matmuls per flat block
                    pix = np.full((8, 8), zz[0] * q[0] / 8.0 + 128.0)
                else:
                    block = (zz * q)[inv_zz].reshape(8, 8)
                    pix = _IDCT_M.T @ block @ _IDCT_M + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
    planes = [p[:height, :width] for p in planes]
    if ncomp == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = [r, g, b]
    elif ncomp == 1:
        rgb = [planes[0]]
    else:
        return None
    return np.stack(
        [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in rgb], axis=-1
    )


def _jpeg_frame_end(payload: bytes, start: int) -> int | None:
    """End offset (exclusive, after EOI) of the JPEG frame starting at
    ``start``, by marker walk + entropy scan — NOT a byte search, which
    would false-split on 0xFFD9 bytes inside table segments. None if the
    frame is malformed/truncated."""
    if payload[start : start + 2] != b"\xff\xd8":
        return None
    pos = start + 2
    in_scan = False
    while pos < len(payload):
        if not in_scan:
            if pos + 2 > len(payload) or payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xD9:
                return pos + 2
            if marker == 0xDA:
                in_scan = True
            if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
                pos += 2  # standalone markers
                continue
            if pos + 4 > len(payload):
                return None
            (seglen,) = struct.unpack_from(">H", payload, pos + 2)
            pos += 2 + seglen
        else:
            # entropy data: skip until a real marker (0xFF not followed
            # by 0x00 stuffing or an RST)
            if payload[pos] != 0xFF:
                pos += 1
                continue
            if pos + 1 >= len(payload):
                return None
            nxt = payload[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xD9:
                return pos + 2
            return None  # unexpected in-scan marker (multi-scan out of scope)
    return None


def split_mjpeg(payload: bytes) -> list[tuple[int, int]]:
    """Frame (start, end) offsets of an MJPEG elementary stream — the
    real-world motion-JPEG transport IS concatenated JFIF frames. Stops
    at the first malformed frame (prefix frames stay usable)."""
    frames = []
    pos = 0
    while pos + 4 <= len(payload) and payload[pos : pos + 2] == b"\xff\xd8":
        end = _jpeg_frame_end(payload, pos)
        if end is None:
            break
        frames.append((pos, end))
        pos = end
    return frames


def encode_mjpeg(frames: list[bytes]) -> bytes:
    """MJPEG elementary stream = frame concatenation."""
    return b"".join(frames)


def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    """One RIFF chunk: fourcc + little-endian size + data + even pad."""
    return (
        fourcc + len(data).to_bytes(4, "little") + data
        + (b"\x00" if len(data) & 1 else b"")
    )


def _riff_list(list_type: bytes, data: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + data)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """REAL AVI (RIFF) container around MJPEG frames, per the public
    Microsoft AVI RIFF spec: RIFF('AVI ' LIST('hdrl' avih
    LIST('strl' strh strf)) LIST('movi' '00dc'...)). One 'vids' stream
    with fccHandler/biCompression 'MJPG', 24-bit frames. The optional
    idx1 index is deliberately omitted (flags don't claim it): readers
    then walk 'movi' directly, and tail truncation kills exactly the
    LAST frame — the same corrupt-class behavior as the elementary
    stream, which the catalog contract relies on."""
    n = len(frames)
    buf = max((len(f) for f in frames), default=0)
    usec = 1_000_000 // max(1, fps)
    avih = struct.pack(
        "<14I",
        usec,                 # dwMicroSecPerFrame
        buf * max(1, fps),    # dwMaxBytesPerSec (upper bound)
        0,                    # dwPaddingGranularity
        0,                    # dwFlags: no index claimed
        n,                    # dwTotalFrames
        0,                    # dwInitialFrames
        1,                    # dwStreams
        buf,                  # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,           # dwReserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0,        # dwFlags
            0, 0,     # wPriority, wLanguage
            0,        # dwInitialFrames
            1,        # dwScale
            max(1, fps),  # dwRate (rate/scale = fps)
            0,        # dwStart
            n,        # dwLength (frames)
            buf,      # dwSuggestedBufferSize
            0,        # dwQuality (driver default)
            0,        # dwSampleSize (0: one sample per chunk)
        )
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def split_avi_mjpeg(payload: bytes) -> list[tuple[int, int]]:
    """Frame (start, end) offsets of the '00dc'/'00db' video chunks
    inside an AVI container, by RIFF chunk walk — never a byte search.
    Lenient on TRAILING truncation the way real demuxers are (a cut-off
    file still plays its complete prefix frames): a 'movi' list or video
    chunk extending past the payload yields the frames that fit and
    stops. Returns [] for anything that is not RIFF/'AVI '."""
    if payload is None or len(payload) < 12:
        return []
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return []
    riff_size = int.from_bytes(payload[4:8], "little")
    end = min(len(payload), 8 + riff_size)
    spans: list[tuple[int, int]] = []
    pos = 12
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        data_start = pos + 8
        data_end = data_start + size
        if fourcc == b"LIST" and payload[data_start : data_start + 4] == b"movi":
            bound = min(data_end, end)
            q = data_start + 4
            while q + 8 <= bound:
                cid = payload[q : q + 4]
                csz = int.from_bytes(payload[q + 4 : q + 8], "little")
                cs, ce = q + 8, q + 8 + csz
                if ce > bound:
                    break  # truncated trailing frame: prefix stays usable
                if cid in (b"00dc", b"00db"):
                    spans.append((cs, ce))
                q = ce + (csz & 1)
        if data_end > end:
            break  # truncated trailing top-level chunk
        pos = data_end + (size & 1)
    return spans


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_offset_ms", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_pixel", T.DoubleType(), True),
    ]
)


def sample_video_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    fps: int = 25,
    stride: int = 5,
    max_frames: int = 8,
    decoder: str = "mjpeg",
) -> DataFrame:
    """Video frame sampling: one payload fans out to every
    ``stride``-th frame, up to ``max_frames`` — the mapInPandas shape a
    training pipeline uses to thin video into image rows.

    ``decoder="mjpeg"``: REAL decode — the stream splits on a
    marker-walk frame scanner (:func:`split_mjpeg`) and each sampled
    frame goes through the pure-Python baseline JPEG decoder; rows
    carry dims + exact-sum mean_pixel, NULL fields for a corrupt frame.
    ``decoder="avi"``: REAL CONTAINERIZED decode — the payload is an
    AVI (RIFF) file; frames come from a chunk walk of the 'movi' list
    (:func:`split_avi_mjpeg`), then the same JPEG path.
    ``decoder="mcv"``: REAL INTER-FRAME decode — motion-compensated
    DCT video (:func:`decode_mcv`: P-frames reconstruct from motion
    vectors + coded residuals against the previous reconstruction);
    sampling decodes the needed prefix, the remainder is CRC-walked,
    and structural damage skips the document. Bit-interoperable
    H.264/VP9 stay behind ``decoder="strict"`` (their binary
    CAVLC/CABAC context tables; library absent here)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        split_fn = split_avi_mjpeg if decoder == "avi" else split_mjpeg

        def _frame_rows(b: bytes) -> "list[tuple] | None":
            """Per-payload (frame_idx, ts_ms, w, h, mean) rows — pure
            in the payload bytes, so memoizable across duplicate
            payloads within the task."""
            if decoder == "mcv":
                need = (max(1, stride)) * max_frames
                got = decode_mcv(b, max_frames=need)
                if got is None:
                    return None
                vw, vh, vfps, fr = got
                out = []
                for n, rgb in enumerate(fr[:: max(1, stride)][:max_frames]):
                    src_idx = n * max(1, stride)
                    ts_ms = src_idx * 1000 // max(1, vfps)
                    px_sum = int(rgb.astype(np.int64).sum())
                    n_px = vw * vh * 3
                    out.append(
                        (src_idx, ts_ms, vw, vh, px_sum / (n_px * 255))
                    )
                return out
            out = []
            spans = split_fn(b)
            for n, (s, e) in enumerate(spans[:: max(1, stride)][:max_frames]):
                src_idx = n * max(1, stride)
                ts_ms = src_idx * 1000 // max(1, fps)
                parsed = decode_jpeg(b[s:e])
                if parsed is None:
                    out.append((src_idx, ts_ms, None, None, None))
                else:
                    w, h, ch, px_sum, n_px = parsed
                    out.append((src_idx, ts_ms, w, h, px_sum / (n_px * 255)))
            return out

        # per-task decode memo: exact-duplicate payloads decode once
        frame_rows_of = _memo_by_payload(_frame_rows)

        for pdf in it:
            if decoder == "strict":
                raise NotImplementedError(
                    "compressed-codec video decoding requires ffmpeg-class "
                    "libraries; not available in this environment"
                )
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                fr_rows = frame_rows_of(bytes(payload))
                if fr_rows is None:
                    continue
                rows.extend((doc_id, *t) for t in fr_rows)
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "frame_offset_ms",
                    "width", "height", "mean_pixel",
                ],
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, VIDEO_FRAMES_SCHEMA
    )


def sniff_decode_image(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """Magic-byte dispatch to the real codecs (BMP, PNG, JPEG); None for
    anything else. The ``decoder="auto"`` path of :func:`decode_images`."""
    if payload is None or len(payload) < 8:
        return None
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload[:4] == b"GIF8":
        return decode_gif(payload)
    return None


def decode_images(
    df: DataFrame, id_col: str, payload_col: str, decoder: str = "fake"
) -> DataFrame:
    """Arrow-batched image decode -> (doc_id, width, height, channels,
    mean_pixel).

    - ``decoder="bmp"``: REAL decode of 24-bpp uncompressed BMP payloads
      (pure-Python header parse + numpy pixel math — no image library).
      Non-BMP / truncated payloads yield NULL fields, the corrupt-input
      convention. mean_pixel = exact integer byte sum / (n_bytes * 255),
      one float64 division, so the value hash-matches a SQL oracle.
    - ``decoder="png"``: REAL decode of 8-bit RGB/RGBA non-interlaced
      PNG — the first COMPRESSED format handled without any library
      (stdlib zlib inflate + per-spec scanline unfiltering, CRC-checked).
      Same NULL-on-corrupt and exact-sum disciplines as BMP.
    - ``decoder="jpeg"``: REAL decode of baseline JFIF (canonical
      Huffman entropy decode + dequant + IDCT + YCbCr convert, pure
      Python/numpy — see :func:`decode_jpeg`). Same NULL-on-corrupt
      convention; 4:4:4 8-bit sequential scope.
    - ``decoder="gif"``: REAL decode of LZW-compressed GIF87a/89a
      (:func:`decode_gif` — validated against 36 real-world encoder
      outputs). Same NULL-on-corrupt convention.
    - ``decoder="auto"``: magic-byte dispatch across the real codecs
      (BMP, PNG, JPEG, GIF); anything else yields NULLs.
    - ``decoder="fake"``: deterministic dims/mean from the payload hash
      (plumbing tests without any codec assumption).
    - ``decoder="strict"``: raises where an external codec library
      (ffmpeg etc.) would be called for formats still out of scope
      (compressed video codecs, MP3); those libs aren't in this
      environment."""
    real = {
        "bmp": decode_bmp,
        "png": decode_png,
        "jpeg": decode_jpeg,
        "gif": decode_gif,
        "auto": sniff_decode_image,
    }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _decoded(b: bytes) -> tuple:
            parsed = real[decoder](b)
            if parsed is None:
                return (None, None, None, None)
            w, h, ch, px_sum, n_px = parsed
            return (w, h, ch, px_sum / (n_px * 255))

        # per-task decode memo: exact-duplicate payloads decode once
        decoded_of = _memo_by_payload(_decoded)

        for pdf in it:
            if decoder == "strict":
                raise NotImplementedError(
                    "compressed image decoding requires an image library "
                    "(e.g. Pillow); not available in this environment"
                )
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None or len(payload) == 0:
                    rows.append((doc_id, None, None, None, None))
                    continue
                if decoder in real:
                    rows.append((doc_id, *decoded_of(bytes(payload))))
                    continue
                w, h = _fake_dims(bytes(payload))
                mean_pixel = sum(payload[:256]) / min(len(payload), 256) / 255.0
                rows.append((doc_id, w, h, 3, mean_pixel))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels", "mean_pixel"]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, DECODED_IMAGE_SCHEMA
    )


def sample_audio_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    frame_ms: int = 1000,
    max_frames: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """Frame sampling: one payload row fans out to N frame rows
    (the mapInPandas shape real audio pipelines use).

    ``decoder="wav"``: REAL decode of mono 16-bit PCM WAV (pure-Python
    RIFF chunk walk + numpy) — frames are ``frame_ms`` windows of
    samples at the file's sample rate; rms is computed from the exact
    integer sum of squares with one float64 division + sqrt, the
    hash-parity discipline. Non-WAV payloads are skipped.
    ``decoder="adpcm"``: REAL decode of mono IMA ADPCM WAV (4-bit
    compressed, :func:`decode_wav_adpcm`) — same frame/rms contract over
    the reconstructed PCM16 samples.
    ``decoder="flac"``: REAL decode of mono 16-bit FLAC
    (Rice-coded lossless, :func:`decode_flac`) — same contract; decode
    failures (CRC/MD5/truncation) skip the document.
    ``decoder="subband"``: REAL decode of the LOSSY psychoacoustic
    subband format (:func:`decode_subband` — 576-line MDCT +
    Layer-II-style quantization; the MP3 toolchain family) — same
    contract over the reconstructed PCM16 samples; structural damage
    (magic/CRC/truncation) skips the document."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _frame_rows(b: bytes) -> "list[tuple] | None":
            """Per-payload (frame_idx, offset_ms, rms) rows — pure in
            the payload bytes, memoizable across duplicate payloads."""
            if decoder in ("wav", "adpcm", "flac", "subband"):
                parsed = (
                    decode_wav_pcm16(b)
                    if decoder == "wav"
                    else decode_wav_adpcm(b)
                    if decoder == "adpcm"
                    else decode_flac(b)
                    if decoder == "flac"
                    else decode_subband(
                        b, max_ms=frame_ms * max_frames
                    )
                )
                if parsed is None:
                    return None
                rate, samples = parsed
                spf = max(1, rate * frame_ms // 1000)
                n_frames = min(max_frames, max(1, -(-len(samples) // spf)))
                out = []
                for i in range(n_frames):
                    chunk = samples[i * spf : (i + 1) * spf]
                    if len(chunk) == 0:
                        break
                    sq = int(np.sum(chunk.astype(np.int64) ** 2))
                    # math.sqrt is correctly-rounded IEEE754, same as
                    # SQL sqrt() — bit-identical for oracle hashing
                    out.append((i, i * frame_ms, math.sqrt(sq / len(chunk))))
                return out
            out = []
            n_frames = min(max_frames, max(1, len(b) // 64))
            for i in range(n_frames):
                chunk = b[i * 64 : (i + 1) * 64] or b"\0"
                rms = (sum(x * x for x in chunk) / len(chunk)) ** 0.5
                out.append((i, i * frame_ms, rms))
            return out

        # per-task decode memo: exact-duplicate payloads decode once
        frame_rows_of = _memo_by_payload(_frame_rows)

        for pdf in it:
            if decoder == "strict":
                raise NotImplementedError(
                    "compressed audio decoding requires an audio library; "
                    "not available in this environment"
                )
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                fr_rows = frame_rows_of(bytes(payload))
                if fr_rows is None:
                    continue
                rows.extend((doc_id, *t) for t in fr_rows)
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_offset_ms", "rms"]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, AUDIO_FRAMES_SCHEMA
    )


def _bmp_pixels(payload: bytes) -> "np.ndarray | None":
    """Top-down (H, W, 3) BGR pixel array from a 24-bpp BMP, or None on
    any corruption (same validation as :func:`decode_bmp`)."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        return None
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if width <= 0 or height_raw == 0 or bpp != 24 or compression != 0:
        return None
    height = abs(height_raw)
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if len(payload) < data_offset + stride * height:
        return None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, :row_bytes]
    if height_raw > 0:
        rows = rows[::-1]  # stored bottom-up -> top-down
    return rows.reshape(height, width, 3)


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    width: int,
    height: int,
    codec: str = "bmp",
) -> DataFrame:
    """REAL nearest-neighbor resize — decode to a pixel array, sample
    with the standard floor(i * src/dst) index map (one numpy
    fancy-index, no per-pixel Python), re-encode in the SAME format.
    Output rows: (doc_id, payload, width, height) with NULL payload for
    corrupt / wrong-format inputs (the decode_images convention).

    ``codec="bmp"``: 24-bpp BMP in/out (the uncompressed-normalization
    step a training-data image pipeline runs after decode).
    ``codec="jpeg"``: baseline JFIF in/out through the real pure-Python
    codec pair (full entropy decode -> resize -> re-encode; channel
    count preserved). Lossy by nature — the oracle contract rides
    solid-gray inputs, which round-trip exactly.
    ``codec="png"``: 8-bit truecolor PNG in/out (inflate + unfilter ->
    resize -> refilter + deflate; RGB/RGBA preserved). Lossless, so
    resized pixels are exactly the sampled originals.
    ``codec="gif"``: GIF in/out — the resize samples in PALETTE-INDEX
    space and re-encodes through LZW with the ORIGINAL color table, so
    the pass is lossless and the palette discipline (the reason GIFs
    exist) survives.
    ``codec="strict"``: raise — the seam for formats whose decode needs
    an external library."""
    if width <= 0 or height <= 0:
        raise ValueError("target dims must be positive")
    if codec not in ("bmp", "jpeg", "png", "gif", "strict"):
        raise ValueError(f"unknown resize codec {codec!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _resized(b: bytes) -> "bytes | None":
            """Per-payload decode -> resize -> re-encode — pure in the
            payload bytes, memoizable across duplicate payloads."""
            if codec == "gif":
                got = _gif_frame(b)
                if got is None:
                    return None
                idx2, rgb = got
                sh, sw = idx2.shape
                ys = (np.arange(height) * sh) // height
                xs = (np.arange(width) * sw) // width
                sampled = idx2[np.ix_(ys, xs)]
                palette = [tuple(int(v) for v in c) for c in rgb]
                return encode_gif(
                    width, height, palette, sampled.reshape(-1).tobytes()
                )
            px = (
                _bmp_pixels(b)
                if codec == "bmp"
                else _png_pixels(b)
                if codec == "png"
                else _jpeg_pixels(b)
            )
            if px is None:
                return None
            sh, sw = px.shape[0], px.shape[1]
            ys = (np.arange(height) * sh) // height
            xs = (np.arange(width) * sw) // width
            out = px[np.ix_(ys, xs)]
            if codec == "bmp":
                return encode_bmp(width, height, out.tobytes())
            if codec == "png":
                return encode_png(
                    width, height, out.tobytes(), channels=px.shape[2]
                )
            return encode_jpeg(
                width, height, out.tobytes(), channels=px.shape[2]
            )

        # per-task decode memo: exact-duplicate payloads resize once
        resized_of = _memo_by_payload(_resized)

        for pdf in it:
            if codec == "strict":
                raise NotImplementedError(
                    "resize of this format requires an image library; "
                    "not available in this environment"
                )
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else None
                enc = resized_of(b) if b is not None else None
                rows.append((doc_id, enc, width, height))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "width", "height"]
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(batches, schema)


def resize_images_stub(
    df: DataFrame, id_col: str, payload_col: str, width: int, height: int
) -> DataFrame:
    """Kept for API compatibility: the strict-raise variant for formats
    whose decode would need an external library. BMP resize is REAL —
    use :func:`resize_images`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "compressed-format resize requires an image library; "
            "decode first, or use resize_images for BMP payloads"
        )
        yield  # pragma: no cover

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(batches, schema)


# ---------------------------------------------------------------------------
# Psychoacoustic subband audio codec (ninth from-scratch compression
# family, the LOSSY perceptual one). This is the MP3 toolchain built
# pure-numpy: a 576-line MDCT (Layer III's long-block geometry — sine
# window, exact TDAC perfect reconstruction), 32 scalefactor bands of
# 18 spectral lines, a psychoacoustic model (Terhardt absolute
# threshold in quiet + two-slope inter-band spreading -> per-band
# SMR), greedy minimum-MNR bit allocation against an exact
# MPEG-style bitrate budget, and ISO 11172-3 Layer-II quantization
# discipline (cube-root-of-two scalefactor lattice, midtread
# quantizer classes 3..65535 with grouped 3/5/9-level triplet
# codewords, scalefactor sharing flags). Two deliberate, documented
# deviations keep it self-contained rather than bit-interoperable
# with ISO decoders — the parts of the spec that are binary TABLES,
# not algorithms (11172-3 Annex 3-B Huffman/window tables):
#   - entropy stage is fixed-width grouped codewords (Layer II
#     discipline) rather than Layer III's 34 tabulated Huffman tables;
#   - framing is a private magic + CRC-16 per frame instead of the
#     MPEG syncword/bitrate-index header.
# Reference parity note: the reference treats compressed audio as an
# opaque payload (no codec anywhere in sqlserver-pg-cdc); this family
# exists for the LLM-pipeline plane (BASELINE.json), closing the
# "psychoacoustic subband coding" seam that `decoder="strict"`
# documented through round 8.
# ---------------------------------------------------------------------------

_SB_MAGIC = b"SBC2"
_SB_LINES = 576          # MDCT spectral lines per block (Layer III long block)
_SB_WIN = 2 * _SB_LINES  # 1152-sample sine window
_SB_NBANDS = 32          # scalefactor bands, 18 lines each
_SB_BANDW = _SB_LINES // _SB_NBANDS
_SB_FRAME_BLOCKS = 2     # 1152 new samples per frame
_SB_FRAME_SAMPLES = _SB_FRAME_BLOCKS * _SB_LINES
_SB_BAND_VALS = _SB_FRAME_BLOCKS * _SB_BANDW  # 36 values/band/frame
# allocation index -> quantizer levels (Layer II Table B.2 shape:
# 3/5/9 are the grouped classes)
_SB_NLEVELS = (
    0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 16383, 65535,
)
_SB_GROUP_BITS = {3: 5, 5: 7, 9: 10}  # triplet -> one codeword
_SB_CODE_BITS = {
    7: 3, 15: 4, 31: 5, 63: 6, 127: 7, 255: 8, 511: 9, 1023: 10,
    2047: 11, 4095: 12, 16383: 14, 65535: 16,
}
# scalefactor table: 4.0 * 2^(-i/3), the 11172-3 cube-root-of-two
# lattice. The spec's table starts at 2.0 for its polyphase domain;
# MDCT coefficients of full-scale input can exceed 2.0, so this table
# starts one octave higher (64 entries — the 6-bit index is fully
# used).
_SB_SCF = tuple(4.0 * 2.0 ** (-(i) / 3.0) for i in range(64))


def _sb_matrices() -> "tuple[np.ndarray, np.ndarray]":
    """(sine window, 576x1152 modulation matrix), built once."""
    global _SB_MAT
    try:
        return _SB_MAT
    except NameError:
        pass
    n = np.arange(_SB_WIN, dtype=np.float64)
    k = np.arange(_SB_LINES, dtype=np.float64)
    w = np.sin(np.pi / _SB_WIN * (n + 0.5))
    m = np.cos(
        np.pi / _SB_LINES
        * (n[None, :] + 0.5 + _SB_LINES / 2.0)
        * (k[:, None] + 0.5)
    )
    _SB_MAT = (w, m)
    return _SB_MAT


def _sb_analysis(x_norm: "np.ndarray") -> "np.ndarray":
    """Normalized samples -> (n_blocks, 576) MDCT line matrix, padded
    so every input sample sits in the fully-overlapped region and the
    block count is a whole number of frames."""
    w, m = _sb_matrices()
    n = len(x_norm)
    blocks = -(-(n + _SB_LINES) // _SB_LINES)  # ceil
    blocks = -(-blocks // _SB_FRAME_BLOCKS) * _SB_FRAME_BLOCKS
    padded = np.zeros((blocks + 1) * _SB_LINES, dtype=np.float64)
    padded[_SB_LINES : _SB_LINES + n] = x_norm
    idx = np.arange(blocks)[:, None] * _SB_LINES + np.arange(_SB_WIN)[None, :]
    # 2/LINES folded into the forward side so a full-scale tone's
    # dominant line sits near its time-domain amplitude
    return (padded[idx] * w[None, :]) @ m.T * (2.0 / _SB_LINES)


def _sb_synthesis(coef: "np.ndarray", n_total: int) -> "np.ndarray":
    """(n_blocks, 576) line matrix -> n_total normalized samples via
    windowed IMDCT overlap-add (exact TDAC reconstruction)."""
    w, m = _sb_matrices()
    blocks = coef.shape[0]
    slabs = (coef @ m) * w[None, :]  # (blocks, 1152)
    out = np.zeros((blocks + 1) * _SB_LINES, dtype=np.float64)
    out[: blocks * _SB_LINES] += slabs[:, : _SB_LINES].reshape(-1)
    out[_SB_LINES:] += slabs[:, _SB_LINES :].reshape(-1)
    return out[_SB_LINES : _SB_LINES + n_total]


def _sb_smr(frame_coef: "np.ndarray", sample_rate: int) -> "np.ndarray":
    """Per-scalefactor-band signal-to-mask ratio for one (2, 576)
    frame.

    Psychoacoustics, closed-form and public: Terhardt's absolute
    threshold in quiet (J. Acoust. Soc. Am. 55, 1979 — the formula
    every perceptual-codec paper reprints) mapped under a 96 dB SPL
    playback assumption, and a two-slope inter-band spreading
    function (-27 dB/band toward higher-frequency maskees, -12
    dB/band toward lower — the triangle MPEG psychoacoustic model 1
    linearizes)."""
    e = frame_coef * frame_coef
    energy = e.reshape(-1, _SB_NBANDS, _SB_BANDW).sum(axis=(0, 2)) / (
        _SB_BAND_VALS
    )
    level = 10.0 * np.log10(energy + 1e-12)  # dBFS-ish
    b = np.arange(_SB_NBANDS, dtype=np.float64)
    dist = b[None, :] - b[:, None]  # maskee - masker
    slope = np.where(dist >= 0.0, 12.0, 27.0)
    spread = level[:, None] - 15.5 - slope * np.abs(dist)
    mask = spread.max(axis=0)
    f_khz = (
        np.maximum((b * _SB_BANDW + _SB_BANDW / 2.0)
                   * sample_rate / (2.0 * _SB_LINES), 20.0)
        / 1000.0
    )
    quiet = (
        3.64 * f_khz**-0.8
        - 6.5 * np.exp(-0.6 * (f_khz - 3.3) ** 2)
        + 1e-3 * f_khz**4
    ) - 96.0
    return level - np.maximum(mask, quiet)


def _sb_step_cost(a: int) -> int:
    """Bits to raise one band from allocation index a to a+1 (samples
    delta + worst-case scalefactor/share-flag cost on the 0->1 step)."""
    n_new = _SB_NLEVELS[a + 1]
    new = (
        12 * _SB_GROUP_BITS[n_new]
        if n_new in _SB_GROUP_BITS
        else _SB_BAND_VALS * _SB_CODE_BITS[n_new]
    )
    n_old = _SB_NLEVELS[a]
    old = 0
    if n_old:
        old = (
            12 * _SB_GROUP_BITS[n_old]
            if n_old in _SB_GROUP_BITS
            else _SB_BAND_VALS * _SB_CODE_BITS[n_old]
        )
    return new - old + (1 + 12 if a == 0 else 0)  # share flag + 2 scfs


_SB_STEP_COST = tuple(
    _sb_step_cost(a) for a in range(len(_SB_NLEVELS) - 1)
)
_SB_STEP_SNR = (0.0,) + tuple(
    20.0 * math.log10(n) for n in _SB_NLEVELS[1:]
)


def _sb_allocate(smr: "np.ndarray", budget_bits: int) -> "np.ndarray":
    """Layer-II-style greedy allocation: repeatedly raise the band
    with the worst mask-to-noise ratio one allocation step while the
    step still fits the frame's bit budget. A band whose next step no
    longer fits is retired permanently — the budget only shrinks, so
    an unaffordable step stays unaffordable (argmin over a live mask
    replaces the original full argsort per step)."""
    alloc = np.zeros(_SB_NBANDS, dtype=np.int64)
    spent = 0
    # quantizer SNR ~ 20 log10(levels), 0 dB for an uncoded band
    # (11172-3 allocation semantics); MNR = SNR - SMR
    max_a = len(_SB_NLEVELS) - 1
    if budget_bits >= _SB_NBANDS * sum(_SB_STEP_COST):
        # budget saturates every band (high-bitrate/near-lossless
        # profile): skip the greedy entirely
        return np.full(_SB_NBANDS, max_a, dtype=np.int64)
    mnr = -smr.astype(np.float64)
    live = np.ones(_SB_NBANDS, dtype=bool)
    while live.any():
        masked = np.where(live, mnr, np.inf)
        bi = int(np.argmin(masked))
        a = int(alloc[bi])
        c = _SB_STEP_COST[a]
        if spent + c > budget_bits:
            live[bi] = False
            continue
        alloc[bi] = a + 1
        spent += c
        mnr[bi] = _SB_STEP_SNR[a + 1] - smr[bi]
        if a + 1 >= max_a:
            live[bi] = False
    return alloc


def _sb_scf_index(max_abs: float) -> int:
    """Tightest scalefactor covering max_abs (table is decreasing)."""
    lo, hi = 0, len(_SB_SCF)  # binary-search first index with scf < max_abs
    while lo < hi:
        mid = (lo + hi) // 2
        if _SB_SCF[mid] >= max_abs:
            lo = mid + 1
        else:
            hi = mid
    return max(0, lo - 1)


def encode_subband(
    sample_rate: int,
    samples: "np.ndarray | list[int]",
    kbps: int = 192,
) -> bytes:
    """Mono 16-bit psychoacoustic subband encode (see the section
    comment above). ``kbps`` sets the per-frame bit budget exactly as
    the MPEG bitrate field does: ``kbps*1000*1152/sample_rate`` bits
    per 1152-sample frame."""
    x = np.asarray(samples, dtype=np.int16).astype(np.float64) / 32768.0
    n_total = len(x)
    coef = _sb_analysis(x)
    n_frames = coef.shape[0] // _SB_FRAME_BLOCKS
    head = _MsbWriter()
    for bch in _SB_MAGIC:
        head.write(bch, 8)
    head.write(1, 8)  # version
    head.write(sample_rate, 32)
    head.write(n_total, 40)
    head.write(kbps, 16)
    head.write(n_frames, 32)
    head_bytes = bytes(head.out)
    out = bytearray(head_bytes)
    out += _crc16(head_bytes[4:]).to_bytes(2, "big")
    frame_budget = max(0, int(kbps * 1000 * _SB_FRAME_SAMPLES / sample_rate))
    for fi in range(n_frames):
        fc = coef[fi * _SB_FRAME_BLOCKS : (fi + 1) * _SB_FRAME_BLOCKS]
        smr = _sb_smr(fc, sample_rate)
        overhead = _SB_NBANDS * 4 + 16  # allocation field + frame CRC
        alloc = _sb_allocate(smr, max(0, frame_budget - overhead))
        wtr = _MsbWriter()
        for bnd in range(_SB_NBANDS):
            wtr.write(int(alloc[bnd]), 4)
        # per band: one scalefactor per block, shared when equal
        # (SCFSI discipline collapsed to the 2-block frame)
        sub = np.abs(fc).reshape(_SB_FRAME_BLOCKS, _SB_NBANDS, _SB_BANDW)
        mx = sub.max(axis=2)  # (2, 32)
        scf_idx = np.zeros((_SB_FRAME_BLOCKS, _SB_NBANDS), dtype=np.int64)
        for blk in range(_SB_FRAME_BLOCKS):
            for bnd in range(_SB_NBANDS):
                scf_idx[blk, bnd] = _sb_scf_index(float(mx[blk, bnd]))
        for bnd in range(_SB_NBANDS):
            if not alloc[bnd]:
                continue
            i0, i1 = int(scf_idx[0, bnd]), int(scf_idx[1, bnd])
            if i0 == i1:
                wtr.write(1, 1)
                wtr.write(i0, 6)
            else:
                wtr.write(0, 1)
                wtr.write(i0, 6)
                wtr.write(i1, 6)
        # spectral values: block-major per band, triplet codewords for
        # the grouped classes (12 triplets per band per frame)
        for bnd in range(_SB_NBANDS):
            nlev = _SB_NLEVELS[int(alloc[bnd])]
            if not nlev:
                continue
            half = (nlev - 1) // 2
            vals = np.concatenate(
                [
                    fc[blk, bnd * _SB_BANDW : (bnd + 1) * _SB_BANDW]
                    / _SB_SCF[int(scf_idx[blk, bnd])]
                    for blk in range(_SB_FRAME_BLOCKS)
                ]
            )
            q = (
                np.clip(np.rint(vals * half), -half, half).astype(np.int64)
                + half
            )
            if nlev in _SB_GROUP_BITS:
                gb = _SB_GROUP_BITS[nlev]
                tri = q.reshape(-1, 3)
                codes = tri[:, 0] + nlev * tri[:, 1] + nlev * nlev * tri[:, 2]
                width = gb
            else:
                codes = q
                width = _SB_CODE_BITS[nlev]
            # bulk MSB-first bit expansion, one write_bit_array call
            shifts = np.arange(width - 1, -1, -1, dtype=np.int64)
            bits = ((codes[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
            wtr.write_bit_array(bits.reshape(-1))
        wtr.align()
        body = bytes(wtr.out)
        out += len(body).to_bytes(3, "big") + body
        out += _crc16(body).to_bytes(2, "big")
    return bytes(out)


def decode_subband(
    payload: bytes, max_ms: "int | None" = None
) -> "tuple[int, np.ndarray] | None":
    """Inverse of :func:`encode_subband`; None on any structural
    damage (magic, header/frame CRC, truncation — every bit read is
    bounds-checked, and a stream with fewer frames than the declared
    sample count needs fails rather than returning a short signal).

    ``max_ms`` bounds reconstruction work for samplers that only need
    a prefix (the `decode_mcv` discipline): frames past the needed
    overlap region are still length+CRC-walked — truncation never
    passes silently — but their subband fields are not parsed and no
    synthesis runs for them, so per-document decode cost follows the
    SAMPLE budget, not the clip length."""
    if len(payload) < 22 or payload[:4] != _SB_MAGIC:
        return None
    try:
        r = _MsbReader(payload, start=4)
        if r.read(8) != 1:
            return None
        sample_rate = r.read(32)
        n_total = r.read(40)
        r.read(16)  # kbps: informational
        n_frames = r.read(32)
        if _crc16(payload[4:20]) != r.read(16):
            return None
        if sample_rate <= 0 or n_frames > (n_total // _SB_FRAME_SAMPLES) + 2:
            return None
        # allocation bound: every declared frame costs at least 5
        # payload bytes (3-byte length + CRC-16), so a header that
        # declares more frames than the payload can physically hold is
        # structural damage — reject BEFORE sizing coef from n_frames.
        # (A 24-byte payload with a valid header CRC and n_total=2^39
        # must return None, not attempt a multi-terabyte np.zeros.)
        if len(payload) < 22 + 5 * n_frames:
            return None
        want = n_total
        if max_ms is not None:
            want = min(n_total, (sample_rate * max_ms) // 1000)
        # output sample i needs OLA blocks through (i + WIN) / LINES;
        # frames past that are walked (length + CRC), not parsed
        need_blocks = -(-(want + _SB_LINES) // _SB_LINES) + 1
        need_frames = min(
            n_frames, -(-need_blocks // _SB_FRAME_BLOCKS)
        )
        coef = np.zeros(
            (need_frames * _SB_FRAME_BLOCKS, _SB_LINES), dtype=np.float64
        )
        pos = r.byte_pos()
        for fi in range(n_frames):
            if pos + 3 > len(payload):
                return None
            blen = int.from_bytes(payload[pos : pos + 3], "big")
            body = payload[pos + 3 : pos + 3 + blen]
            if len(body) != blen or pos + 3 + blen + 2 > len(payload):
                return None
            if (
                int.from_bytes(
                    payload[pos + 3 + blen : pos + 5 + blen], "big"
                )
                != _crc16(body)
            ):
                return None
            pos += 5 + blen
            if fi >= need_frames:
                continue  # CRC/length walk only
            fr = _MsbReader(body)
            alloc = [fr.read(4) for _ in range(_SB_NBANDS)]
            scf = np.ones(
                (_SB_FRAME_BLOCKS, _SB_NBANDS), dtype=np.float64
            )
            for bnd in range(_SB_NBANDS):
                if not alloc[bnd]:
                    continue
                if fr.read(1):
                    i0 = i1 = fr.read(6)
                else:
                    i0, i1 = fr.read(6), fr.read(6)
                scf[0, bnd], scf[1, bnd] = _SB_SCF[i0], _SB_SCF[i1]
            base = fi * _SB_FRAME_BLOCKS
            # bulk fixed-width field extraction over the body's bit
            # view (one unpackbits per frame; the per-code read() loop
            # was the decode hot spot at bench scale)
            bits, _ = fr.bit_view()
            bpos = fr.pos
            for bnd in range(_SB_NBANDS):
                nlev = _SB_NLEVELS[alloc[bnd]]
                if not nlev:
                    continue
                half = (nlev - 1) // 2
                if nlev in _SB_GROUP_BITS:
                    width = _SB_GROUP_BITS[nlev]
                    count = _SB_BAND_VALS // 3
                else:
                    width = _SB_CODE_BITS[nlev]
                    count = _SB_BAND_VALS
                if bpos + count * width > len(bits):
                    raise EOFError
                w8 = (1 << np.arange(width - 1, -1, -1, dtype=np.int64))
                field = bits[bpos : bpos + count * width].reshape(count, width)
                codes = field.astype(np.int64) @ w8
                bpos += count * width
                if nlev in _SB_GROUP_BITS:
                    if (codes >= nlev * nlev * nlev).any():
                        return None
                    qv = np.empty(_SB_BAND_VALS, dtype=np.float64)
                    qv[0::3] = codes % nlev
                    qv[1::3] = (codes // nlev) % nlev
                    qv[2::3] = codes // (nlev * nlev)
                    qv -= half
                else:
                    if (codes >= nlev).any():
                        return None
                    qv = codes.astype(np.float64) - half
                for blk in range(_SB_FRAME_BLOCKS):
                    coef[
                        base + blk,
                        bnd * _SB_BANDW : (bnd + 1) * _SB_BANDW,
                    ] = (
                        qv[blk * _SB_BANDW : (blk + 1) * _SB_BANDW]
                        * (scf[blk, bnd] / half)
                    )
            fr.pos = bpos
        if n_frames * _SB_FRAME_SAMPLES < n_total:
            return None
        y = _sb_synthesis(coef, want)
        pcm = np.clip(np.rint(y * 32768.0), -32768, 32767).astype(np.int16)
        return sample_rate, pcm
    except (EOFError, MemoryError):
        # MemoryError belongs to the NULL-on-corrupt contract too: an
        # untrusted header must never fail the Spark task.
        return None


# ---------------------------------------------------------------------------
# Motion-compensated DCT video codec (tenth from-scratch compression
# family, the INTER-FRAME one). This is the H.26x/MPEG hybrid-coding
# toolchain built pure-numpy: 4:2:0 YCbCr planes, 16x16 macroblocks,
# closed-loop prediction from the RECONSTRUCTED reference (no encoder/
# decoder drift), five-step logarithmic motion search (+/-31 full-pel),
# mode decision per macroblock (skip / inter+MV / intra), 8x8
# orthonormal DCT over prediction residuals, uniform quantization
# (DC step 2, AC step qscale), zigzag + sparse (position, level)
# coefficient coding, DEFLATE entropy stage, CRC-16 framed payloads.
# One deliberate, documented deviation keeps it self-contained rather
# than bit-interoperable: the entropy stage is zlib DEFLATE instead of
# H.264's CAVLC/CABAC — the part of that spec that is binary context
# TABLES, not algorithms. Reference parity note: the reference treats
# video as an opaque payload (no codec in sqlserver-pg-cdc); this
# family exists for the LLM-pipeline plane (BASELINE.json), closing
# the "H.264-class inter-frame video" seam that `decoder="strict"`
# documented through round 8.
# ---------------------------------------------------------------------------

_MCV_MAGIC = b"MCV1"


def _mcv_dct_matrix() -> "np.ndarray":
    """Orthonormal 8x8 DCT-II matrix (D @ B @ D.T forward), cached."""
    global _MCV_D
    try:
        return _MCV_D
    except NameError:
        pass
    j = np.arange(8)
    d = np.cos((2 * j[None, :] + 1) * j[:, None] * np.pi / 16) * 0.5
    d[0] /= math.sqrt(2.0)
    _MCV_D = d
    return _MCV_D


def _mcv_zigzag() -> "np.ndarray":
    """Zigzag scan order for an 8x8 block (flat indices), cached."""
    global _MCV_ZZ
    try:
        return _MCV_ZZ
    except NameError:
        pass
    order = sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda ij: (
            ij[0] + ij[1],
            ij[0] if (ij[0] + ij[1]) % 2 else ij[1],
        ),
    )
    _MCV_ZZ = np.array([i * 8 + j for i, j in order], dtype=np.int64)
    return _MCV_ZZ


def _mcv_blocks(plane: "np.ndarray") -> "np.ndarray":
    """(H, W) -> (H//8 * W//8, 8, 8) raster-order block stack."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _mcv_unblocks(blocks: "np.ndarray", h: int, w: int) -> "np.ndarray":
    return (
        blocks.reshape(h // 8, w // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
    )


def _mcv_quant_block(block: "np.ndarray", qscale: int) -> "np.ndarray":
    """Forward DCT + uniform quantization -> int32 coefficient block.
    DC step is 2 (a flat even-valued block reconstructs EXACTLY — the
    analytic-oracle anchor), AC step is qscale."""
    d = _mcv_dct_matrix()
    c = d @ block @ d.T
    q = np.full((8, 8), float(qscale))
    q[0, 0] = 2.0
    return np.rint(c / q).astype(np.int32)


def _mcv_dequant_block(coeffs: "np.ndarray", qscale: int) -> "np.ndarray":
    d = _mcv_dct_matrix()
    q = np.full((8, 8), float(qscale))
    q[0, 0] = 2.0
    return d.T @ (coeffs.astype(np.float64) * q) @ d


def _mcv_write_block(out: bytearray, coeffs: "np.ndarray") -> None:
    zz = _mcv_zigzag()
    flat = coeffs.reshape(-1)[zz]
    nz = np.flatnonzero(flat)
    out.append(len(nz))
    for p in nz:
        lvl = int(flat[p])
        out.append(int(p))
        out += int(lvl & 0xFFFF).to_bytes(2, "big")


def _mcv_read_block(buf: bytes, pos: int) -> "tuple[np.ndarray, int] | None":
    if pos >= len(buf):
        return None
    n = buf[pos]
    pos += 1
    if n > 64 or pos + 3 * n > len(buf):
        return None
    zz = _mcv_zigzag()
    flat = np.zeros(64, dtype=np.int32)
    for _ in range(n):
        p = buf[pos]
        if p > 63:
            return None
        lvl = int.from_bytes(buf[pos + 1 : pos + 3], "big")
        if lvl >= 0x8000:
            lvl -= 0x10000
        flat[zz[p]] = lvl
        pos += 3
    return flat.reshape(8, 8), pos


def _rgb_to_ycbcr420(
    rgb: "np.ndarray",
) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """JPEG-convention color transform + 2x2-mean chroma subsample.
    Gray input (R=G=B) maps to Y=R, Cb=Cr=128 exactly."""
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    h, w = y.shape
    sub = lambda p: p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    rint8 = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)
    return rint8(y), rint8(sub(cb)), rint8(sub(cr))


def _ycbcr420_to_rgb(
    y: "np.ndarray", cb: "np.ndarray", cr: "np.ndarray"
) -> "np.ndarray":
    yf = y.astype(np.float64)
    cbf = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1).astype(np.float64)
    crf = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1).astype(np.float64)
    r = yf + 1.402 * (crf - 128.0)
    g = yf - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0)
    b = yf + 1.772 * (cbf - 128.0)
    rint8 = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)
    return np.stack([rint8(r), rint8(g), rint8(b)], axis=2)


def _mcv_motion_search(
    ref: "np.ndarray", cur: "np.ndarray", my: int, mx: int
) -> "tuple[int, int, int]":
    """Hybrid motion search (+/-31 full-pel) for the 16x16 block at
    (my, mx) against the RECONSTRUCTED reference: coarse logarithmic
    steps (16, 8) for large motion, then an exhaustive +/-4 window
    around the better of (coarse best, origin) — the NTSS insight that
    a pure logarithmic walk strands in local minima when a flat
    predictor locally beats misaligned texture. Candidates outside the
    frame are skipped; returns (dy, dx, sad)."""
    h, w = ref.shape
    blk = cur[my : my + 16, mx : mx + 16].astype(np.int64)

    def sad_at(ny: int, nx: int) -> "int | None":
        sy, sx = my + ny, mx + nx
        if sy < 0 or sx < 0 or sy + 16 > h or sx + 16 > w:
            return None
        return int(
            np.abs(
                ref[sy : sy + 16, sx : sx + 16].astype(np.int64) - blk
            ).sum()
        )

    zero_sad = sad_at(0, 0)
    best_dy = best_dx = 0
    best = zero_sad if zero_sad is not None else 1 << 60
    if best == 0:
        return 0, 0, 0
    for step in (16, 8):
        improved = True
        while improved:
            improved = False
            for dy, dx in (
                (-step, 0), (step, 0), (0, -step), (0, step),
                (-step, -step), (-step, step), (step, -step), (step, step),
            ):
                ny, nx = best_dy + dy, best_dx + dx
                if abs(ny) > 27 or abs(nx) > 27:
                    continue  # leave room for the +/-4 refinement
                sad = sad_at(ny, nx)
                if sad is not None and sad < best:
                    best, best_dy, best_dx = sad, ny, nx
                    improved = True
    centers = {(best_dy, best_dx), (0, 0)}
    for cy, cx in centers:
        for dy in range(-4, 5):
            for dx in range(-4, 5):
                ny, nx = cy + dy, cx + dx
                if abs(ny) > 31 or abs(nx) > 31:
                    continue
                sad = sad_at(ny, nx)
                if sad is not None and sad < best:
                    best, best_dy, best_dx = sad, ny, nx
                if best == 0:
                    return best_dy, best_dx, 0
    return best_dy, best_dx, best


def _mcv_code_plane_intra(
    out: bytearray, plane: "np.ndarray", qscale: int
) -> "np.ndarray":
    """Intra-code a whole plane (level-shifted JPEG-style); returns the
    reconstruction."""
    h, w = plane.shape
    shifted = plane.astype(np.float64) - 128.0
    blocks = _mcv_blocks(shifted)
    rec = np.empty_like(blocks)
    for i in range(blocks.shape[0]):
        qb = _mcv_quant_block(blocks[i], qscale)
        _mcv_write_block(out, qb)
        rec[i] = _mcv_dequant_block(qb, qscale)
    return np.clip(
        np.rint(_mcv_unblocks(rec, h, w) + 128.0), 0, 255
    ).astype(np.uint8)


def _mcv_decode_plane_intra(
    buf: bytes, pos: int, h: int, w: int, qscale: int
) -> "tuple[np.ndarray, int] | None":
    n_blocks = (h // 8) * (w // 8)
    rec = np.empty((n_blocks, 8, 8), dtype=np.float64)
    for i in range(n_blocks):
        got = _mcv_read_block(buf, pos)
        if got is None:
            return None
        qb, pos = got
        rec[i] = _mcv_dequant_block(qb, qscale)
    return (
        np.clip(np.rint(_mcv_unblocks(rec, h, w) + 128.0), 0, 255).astype(
            np.uint8
        ),
        pos,
    )


def encode_mcv(
    frames: "list[np.ndarray]",
    fps: int = 25,
    gop: int = 8,
    qscale: int = 4,
) -> bytes:
    """Motion-compensated video encode: frames are (H, W, 3) uint8 RGB
    with H, W multiples of 16. Every ``gop``-th frame is intra (I);
    the rest are predicted (P) per 16x16 macroblock — skip (zero MV,
    zero residual), inter (searched MV + coded residual), or intra
    fallback when prediction is worse than the block's own variation.
    Prediction always runs against the reconstructed reference, so
    decode is drift-free by construction."""
    assert frames, "at least one frame"
    h, w, _ = frames[0].shape
    assert h % 16 == 0 and w % 16 == 0, "dims must be multiples of 16"
    head = _MsbWriter()
    for bch in _MCV_MAGIC:
        head.write(bch, 8)
    head.write(1, 8)
    head.write(w, 16)
    head.write(h, 16)
    head.write(fps, 8)
    head.write(gop, 8)
    head.write(qscale, 8)
    head.write(len(frames), 32)
    head_bytes = bytes(head.out)
    out = bytearray(head_bytes)
    out += _crc16(head_bytes[4:]).to_bytes(2, "big")
    ref: "tuple[np.ndarray, np.ndarray, np.ndarray] | None" = None
    for fi, rgb in enumerate(frames):
        y, cb, cr = _rgb_to_ycbcr420(rgb)
        body = bytearray()
        if fi % gop == 0 or ref is None:
            ftype = 0
            ry = _mcv_code_plane_intra(body, y, qscale)
            rcb = _mcv_code_plane_intra(body, cb, qscale)
            rcr = _mcv_code_plane_intra(body, cr, qscale)
        else:
            ftype = 1
            ry = np.empty_like(y)
            rcb = np.empty_like(cb)
            rcr = np.empty_like(cr)
            py, pcb, pcr = ref
            for my in range(0, h, 16):
                for mx in range(0, w, 16):
                    cur = y[my : my + 16, mx : mx + 16]
                    dy, dx, sad = _mcv_motion_search(py, y, my, mx)
                    intra_cost = int(
                        np.abs(
                            cur.astype(np.int64)
                            - int(np.rint(cur.mean()))
                        ).sum()
                    )
                    cy, cx = my // 2, mx // 2
                    if sad > intra_cost:
                        body.append(2)  # intra macroblock
                        ry[my : my + 16, mx : mx + 16] = (
                            _mcv_code_plane_intra(body, cur, qscale)
                        )
                        rcb[cy : cy + 8, cx : cx + 8] = (
                            _mcv_code_plane_intra(
                                body, cb[cy : cy + 8, cx : cx + 8], qscale
                            )
                        )
                        rcr[cy : cy + 8, cx : cx + 8] = (
                            _mcv_code_plane_intra(
                                body, cr[cy : cy + 8, cx : cx + 8], qscale
                            )
                        )
                        continue
                    pred_y = py[my + dy : my + dy + 16, mx + dx : mx + dx + 16]
                    pred_cb = pcb[
                        cy + dy // 2 : cy + dy // 2 + 8,
                        cx + dx // 2 : cx + dx // 2 + 8,
                    ]
                    pred_cr = pcr[
                        cy + dy // 2 : cy + dy // 2 + 8,
                        cx + dx // 2 : cx + dx // 2 + 8,
                    ]
                    res_blocks = []
                    all_zero = True
                    for sy in (0, 8):
                        for sx in (0, 8):
                            res = (
                                cur[sy : sy + 8, sx : sx + 8].astype(
                                    np.float64
                                )
                                - pred_y[sy : sy + 8, sx : sx + 8]
                            )
                            qb = _mcv_quant_block(res, qscale)
                            res_blocks.append(qb)
                            all_zero = all_zero and not qb.any()
                    qcb = _mcv_quant_block(
                        cb[cy : cy + 8, cx : cx + 8].astype(np.float64)
                        - pred_cb,
                        qscale,
                    )
                    qcr = _mcv_quant_block(
                        cr[cy : cy + 8, cx : cx + 8].astype(np.float64)
                        - pred_cr,
                        qscale,
                    )
                    all_zero = all_zero and not qcb.any() and not qcr.any()
                    if all_zero and dy == 0 and dx == 0:
                        body.append(0)  # skip
                        ry[my : my + 16, mx : mx + 16] = pred_y
                        rcb[cy : cy + 8, cx : cx + 8] = pred_cb
                        rcr[cy : cy + 8, cx : cx + 8] = pred_cr
                        continue
                    body.append(1)  # inter
                    body.append(dy & 0xFF)
                    body.append(dx & 0xFF)
                    bi = 0
                    for sy in (0, 8):
                        for sx in (0, 8):
                            qb = res_blocks[bi]
                            bi += 1
                            _mcv_write_block(body, qb)
                            ry[
                                my + sy : my + sy + 8,
                                mx + sx : mx + sx + 8,
                            ] = np.clip(
                                np.rint(
                                    pred_y[sy : sy + 8, sx : sx + 8]
                                    + _mcv_dequant_block(qb, qscale)
                                ),
                                0,
                                255,
                            ).astype(np.uint8)
                    _mcv_write_block(body, qcb)
                    _mcv_write_block(body, qcr)
                    rcb[cy : cy + 8, cx : cx + 8] = np.clip(
                        np.rint(
                            pred_cb.astype(np.float64)
                            + _mcv_dequant_block(qcb, qscale)
                        ),
                        0,
                        255,
                    ).astype(np.uint8)
                    rcr[cy : cy + 8, cx : cx + 8] = np.clip(
                        np.rint(
                            pred_cr.astype(np.float64)
                            + _mcv_dequant_block(qcr, qscale)
                        ),
                        0,
                        255,
                    ).astype(np.uint8)
        comp = zlib.compress(bytes(body), 6)
        out.append(ftype)
        out += len(comp).to_bytes(3, "big")
        out += comp
        out += _crc16(comp).to_bytes(2, "big")
        ref = (ry, rcb, rcr)
    return bytes(out)


def decode_mcv(
    payload: bytes, max_frames: "int | None" = None
) -> "tuple[int, int, int, list[np.ndarray]] | None":
    """Inverse of :func:`encode_mcv` -> (width, height, fps, RGB
    frames), or None on structural damage (magic/CRC/truncation; a
    stream with fewer frames than the header declares fails).
    ``max_frames`` bounds reconstruction work for samplers that only
    need a prefix — remaining frames are still CRC/length-walked so
    truncation never passes silently."""
    if len(payload) < 24 or payload[:4] != _MCV_MAGIC:
        return None
    try:
        r = _MsbReader(payload, start=4)
        if r.read(8) != 1:
            return None
        w = r.read(16)
        h = r.read(16)
        fps = r.read(8)
        gop = r.read(8)
        qs = r.read(8)
        n_frames = r.read(32)
        if _crc16(payload[4:16]) != r.read(16):
            return None
        if (
            w == 0 or h == 0 or w % 16 or h % 16
            or fps == 0 or gop == 0 or qs == 0
        ):
            return None
        pos = r.byte_pos()
        frames: "list[np.ndarray]" = []
        ref = None
        for fi in range(n_frames):
            if pos + 4 > len(payload):
                return None
            ftype = payload[pos]
            clen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
            comp = payload[pos + 4 : pos + 4 + clen]
            if len(comp) != clen or pos + 4 + clen + 2 > len(payload):
                return None
            if (
                int.from_bytes(
                    payload[pos + 4 + clen : pos + 6 + clen], "big"
                )
                != _crc16(comp)
            ):
                return None
            pos += 6 + clen
            if max_frames is not None and len(frames) >= max_frames:
                continue  # CRC/length walk only
            # bounded inflate: the 3-byte length field admits 16 MB of
            # compressed input, which a crafted stream (valid CRC over
            # a zip bomb) would expand without limit. The header dims
            # are already CRC-validated, so the worst legal frame body
            # is computable: per 16x16 macroblock at most mode+MV bytes
            # plus six 8x8 blocks of 64 sparse (count,pos,level)
            # entries = 3 + 6*(1 + 64*3) = 1161 bytes (an I-frame's
            # per-MB cost is 6*193 = 1158, under the same bound).
            max_body = (h // 16) * (w // 16) * 1161 + 64
            try:
                infl = zlib.decompressobj()
                body = infl.decompress(comp, max_body + 1)
            except zlib.error:
                return None
            if len(body) > max_body or infl.unconsumed_tail:
                return None
            if ftype == 0:
                got = _mcv_decode_plane_intra(body, 0, h, w, qs)
                if got is None:
                    return None
                y, bp = got
                got = _mcv_decode_plane_intra(body, bp, h // 2, w // 2, qs)
                if got is None:
                    return None
                cb, bp = got
                got = _mcv_decode_plane_intra(body, bp, h // 2, w // 2, qs)
                if got is None:
                    return None
                cr, bp = got
                if bp != len(body):
                    return None
            elif ftype == 1 and ref is not None:
                py, pcb, pcr = ref
                y = np.empty((h, w), dtype=np.uint8)
                cb = np.empty((h // 2, w // 2), dtype=np.uint8)
                cr = np.empty((h // 2, w // 2), dtype=np.uint8)
                bp = 0
                for my in range(0, h, 16):
                    for mx in range(0, w, 16):
                        if bp >= len(body):
                            return None
                        mode = body[bp]
                        bp += 1
                        cy, cx = my // 2, mx // 2
                        if mode == 0:  # skip
                            y[my : my + 16, mx : mx + 16] = py[
                                my : my + 16, mx : mx + 16
                            ]
                            cb[cy : cy + 8, cx : cx + 8] = pcb[
                                cy : cy + 8, cx : cx + 8
                            ]
                            cr[cy : cy + 8, cx : cx + 8] = pcr[
                                cy : cy + 8, cx : cx + 8
                            ]
                            continue
                        if mode == 2:  # intra macroblock
                            got = _mcv_decode_plane_intra(
                                body[bp:], 0, 16, 16, qs
                            )
                            if got is None:
                                return None
                            blk, used = got
                            y[my : my + 16, mx : mx + 16] = blk
                            bp += used
                            got = _mcv_decode_plane_intra(
                                body[bp:], 0, 8, 8, qs
                            )
                            if got is None:
                                return None
                            blk, used = got
                            cb[cy : cy + 8, cx : cx + 8] = blk
                            bp += used
                            got = _mcv_decode_plane_intra(
                                body[bp:], 0, 8, 8, qs
                            )
                            if got is None:
                                return None
                            blk, used = got
                            cr[cy : cy + 8, cx : cx + 8] = blk
                            bp += used
                            continue
                        if mode != 1 or bp + 2 > len(body):
                            return None
                        dy = body[bp]
                        dx = body[bp + 1]
                        bp += 2
                        if dy >= 128:
                            dy -= 256
                        if dx >= 128:
                            dx -= 256
                        sy0, sx0 = my + dy, mx + dx
                        # odd MVs are legal: the encoder's +/-4
                        # refinement emits them, and both sides derive
                        # the chroma offset as floor(dy/2) (Python //),
                        # so prediction stays bit-identical. Chroma
                        # bounds follow from the luma bounds: my is
                        # even, so an odd dy gives odd sy0 >= 1, and
                        # cy + dy//2 = (sy0 - 1)//2 >= 0 with the upper
                        # edge inside h//2 whenever sy0 + 16 <= h.
                        if (
                            sy0 < 0 or sx0 < 0
                            or sy0 + 16 > h or sx0 + 16 > w
                        ):
                            return None
                        pred_y = py[sy0 : sy0 + 16, sx0 : sx0 + 16]
                        pred_cb = pcb[
                            cy + dy // 2 : cy + dy // 2 + 8,
                            cx + dx // 2 : cx + dx // 2 + 8,
                        ]
                        pred_cr = pcr[
                            cy + dy // 2 : cy + dy // 2 + 8,
                            cx + dx // 2 : cx + dx // 2 + 8,
                        ]
                        for sy in (0, 8):
                            for sx in (0, 8):
                                got = _mcv_read_block(body, bp)
                                if got is None:
                                    return None
                                qb, bp = got
                                y[
                                    my + sy : my + sy + 8,
                                    mx + sx : mx + sx + 8,
                                ] = np.clip(
                                    np.rint(
                                        pred_y[
                                            sy : sy + 8, sx : sx + 8
                                        ].astype(np.float64)
                                        + _mcv_dequant_block(qb, qs)
                                    ),
                                    0,
                                    255,
                                ).astype(np.uint8)
                        got = _mcv_read_block(body, bp)
                        if got is None:
                            return None
                        qb, bp = got
                        cb[cy : cy + 8, cx : cx + 8] = np.clip(
                            np.rint(
                                pred_cb.astype(np.float64)
                                + _mcv_dequant_block(qb, qs)
                            ),
                            0,
                            255,
                        ).astype(np.uint8)
                        got = _mcv_read_block(body, bp)
                        if got is None:
                            return None
                        qb, bp = got
                        cr[cy : cy + 8, cx : cx + 8] = np.clip(
                            np.rint(
                                pred_cr.astype(np.float64)
                                + _mcv_dequant_block(qb, qs)
                            ),
                            0,
                            255,
                        ).astype(np.uint8)
                if bp != len(body):
                    return None
            else:
                return None
            frames.append(_ycbcr420_to_rgb(y, cb, cr))
            ref = (y, cb, cr)
        if len(frames) < min(
            n_frames, max_frames if max_frames is not None else n_frames
        ):
            return None
        return w, h, fps, frames
    except EOFError:
        return None


def resample_pcm(
    samples: "np.ndarray", src_rate: int, dst_rate: int
) -> "np.ndarray":
    """Linear-interpolation sample-rate conversion on int16 PCM with
    EXACT rational positions (integer index/fraction math — no float
    phase accumulation, so the output is bit-deterministic across
    platforms): out[j] = x interpolated at j*src/dst, n_out =
    floor(n*dst/src). A constant signal resamples to itself exactly
    (the analytic-oracle anchor). The audio twin of the image resize's
    floor(i*src/dst) index map."""
    if src_rate <= 0 or dst_rate <= 0:
        raise ValueError("rates must be positive")
    x = np.asarray(samples, dtype=np.int64)
    n = len(x)
    n_out = (n * dst_rate) // src_rate
    if n == 0 or n_out == 0:
        return np.zeros(0, dtype=np.int16)
    j = np.arange(n_out, dtype=np.int64)
    num = j * src_rate
    idx = num // dst_rate
    frac = num - idx * dst_rate  # 0 <= frac < dst_rate
    idx = np.minimum(idx, n - 1)
    nxt = np.minimum(idx + 1, n - 1)
    # exact integer interpolation with one final rounding division
    val = x[idx] * (dst_rate - frac) + x[nxt] * frac
    out = (2 * val + dst_rate) // (2 * dst_rate)  # round-half-up
    return np.clip(out, -32768, 32767).astype(np.int16)


def resample_audio(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    target_rate: int,
    decoder: str = "wav",
) -> DataFrame:
    """Audio sample-rate normalization — the preprocessing pass every
    speech/audio training pipeline runs (decode whatever arrived,
    resample to the model's rate, re-encode canonical PCM WAV). Rows:
    (doc_id, payload=mono 16-bit WAV at ``target_rate``, sample_rate,
    n_samples); corrupt/undecodable inputs yield a NULL payload row
    (the resize_images convention). ``decoder``: wav / adpcm / flac /
    subband — all four real audio families feed the same resampler."""
    decoders = {
        "wav": decode_wav_pcm16,
        "adpcm": decode_wav_adpcm,
        "flac": decode_flac,
        "subband": decode_subband,
    }
    if decoder not in decoders and decoder != "strict":
        raise ValueError(f"unknown audio decoder {decoder!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _resampled(b: bytes) -> "tuple | None":
            parsed = decoders[decoder](b)
            if parsed is None:
                return None
            rate, samples = parsed
            out = resample_pcm(samples, rate, target_rate)
            return (encode_wav_pcm16(target_rate, out), len(out))

        # per-task decode memo: exact-duplicate payloads decode once
        resampled_of = _memo_by_payload(_resampled)

        for pdf in it:
            if decoder == "strict":
                raise NotImplementedError(
                    "compressed audio decoding requires an audio library; "
                    "not available in this environment"
                )
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else None
                got = resampled_of(b) if b is not None else None
                if got is None:
                    rows.append((doc_id, None, target_rate, None))
                    continue
                rows.append((doc_id, got[0], target_rate, got[1]))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "payload", "sample_rate", "n_samples"],
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("n_samples", T.LongType(), True),
        ]
    )
    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema
    )


THUMBNAIL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_offset_ms", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def video_thumbnails(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    width: int,
    height: int,
    stride: int = 1,
    max_frames: int = 8,
    decoder: str = "mcv",
    fps: int = 25,
) -> DataFrame:
    """Frame-sample + resize in one pass — the preprocessing shape a
    vision-encoder training pipeline runs over video (sample every
    Nth frame, thumbnail it for the image tower). One payload row fans
    out to up to ``max_frames`` rows of (frame_idx, offset_ms, BMP
    thumbnail at width x height). ``decoder``: mcv (inter-frame decode
    of the needed prefix) / mjpeg / avi (marker/chunk walk + JPEG
    decode of the sampled frames only). ``fps`` is the timestamp base
    for MJPEG/AVI elementary streams, which carry no rate of their own
    (mirrors :func:`sample_video_frames`); the MCV path uses the
    stream's real header fps. Undecodable documents drop; an
    individually corrupt sampled frame yields a NULL payload row
    (the MJPEG sampler convention)."""
    if decoder not in ("mcv", "mjpeg", "avi"):
        raise ValueError(f"unknown thumbnail decoder {decoder!r}")
    if width <= 0 or height <= 0:
        raise ValueError("target dims must be positive")

    def _thumb(rgb: "np.ndarray") -> bytes:
        sh, sw = rgb.shape[0], rgb.shape[1]
        if rgb.shape[2] == 1:  # grayscale source -> gray BGR
            rgb = np.repeat(rgb, 3, axis=2)
        ys = (np.arange(height) * sh) // height
        xs = (np.arange(width) * sw) // width
        # encode_bmp takes top-down BGR rows (the _bmp_pixels layout)
        return encode_bmp(
            width, height,
            np.ascontiguousarray(rgb[np.ix_(ys, xs)][:, :, ::-1]).tobytes(),
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        step = max(1, stride)

        def _thumb_rows(b: bytes) -> "list[tuple] | None":
            """Per-payload (frame_idx, offset_ms, thumb, w, h) rows —
            pure in the payload bytes, memoizable across duplicates."""
            if decoder == "mcv":
                got = decode_mcv(b, max_frames=step * max_frames)
                if got is None:
                    return None
                _, _, vfps, fr = got
                return [
                    (n * step, n * step * 1000 // max(1, vfps),
                     _thumb(rgb), width, height)
                    for n, rgb in enumerate(fr[::step][:max_frames])
                ]
            split_fn = split_avi_mjpeg if decoder == "avi" else split_mjpeg
            out = []
            for n, (s0, e0) in enumerate(split_fn(b)[::step][:max_frames]):
                src = n * step
                px = _jpeg_pixels(b[s0:e0])
                out.append(
                    (src, src * 1000 // max(1, fps),
                     _thumb(px) if px is not None else None,
                     width, height)
                )
            return out

        # per-task decode memo: exact-duplicate payloads decode once
        thumb_rows_of = _memo_by_payload(_thumb_rows)

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                t_rows = thumb_rows_of(bytes(payload))
                if t_rows is None:
                    continue
                rows.extend((doc_id, *t) for t in t_rows)
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "frame_offset_ms",
                    "payload", "width", "height",
                ],
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, THUMBNAIL_SCHEMA
    )


def _dct2_matrix(n: int) -> "np.ndarray":
    """Orthonormal n-point DCT-II matrix, cached per size."""
    global _DCT2_CACHE
    try:
        cache = _DCT2_CACHE
    except NameError:
        cache = _DCT2_CACHE = {}
    m = cache.get(n)
    if m is None:
        j = np.arange(n)
        m = np.cos((2 * j[None, :] + 1) * j[:, None] * np.pi / (2 * n))
        m *= math.sqrt(2.0 / n)
        m[0] /= math.sqrt(2.0)
        cache[n] = m
    return m


def phash_pixels(px: "np.ndarray") -> int:
    """Perceptual hash (pHash) of an (H, W, C) uint8 pixel array: gray
    (channel sum) -> 32x32 index-map downsample (the resize grid) ->
    FIXED-POINT 2-D DCT (the orthonormal basis scaled to a 2^18
    integer lattice; int64 matmuls are exact and order-independent,
    where a float GEMM's summation order varies per BLAS call and
    structured images carry exact coefficient ties at the median whose
    jitter would split one image into several fingerprints) ->
    low-frequency 8x8 block, DC dropped -> median threshold (exact
    order statistic of 63 ints) -> 63-bit fingerprint. Identical
    pixels hash identically REGARDLESS of the container format (the
    cross-format dedup property byte hashes can't give); visually-near
    images land within small Hamming distance. Bit-deterministic on
    any platform, any thread count."""
    gray3 = px.astype(np.int64).sum(axis=2)  # 3x gray: stays integer
    sh, sw = gray3.shape
    ys = (np.arange(32) * sh) // 32
    xs = (np.arange(32) * sw) // 32
    return _phash_of_grid(gray3[np.ix_(ys, xs)])


def _phash_of_grid(g: "np.ndarray") -> int:
    """The shared DCT/threshold core of the perceptual-hash family: a
    32x32 int64 intensity grid (values bounded ~2^11 so the two
    fixed-point matmuls stay exact: |coef| < 2^11*32^2*2^36 << 2^63) ->
    2-D integer DCT -> low 8x8 block, DC dropped -> exact-median
    threshold -> 63-bit fingerprint. `phash_pixels` (image) and
    `vhash_frames` (video) differ only in how they reduce pixels to
    this grid."""
    dq = _dct2_int_matrix()
    d = dq @ g @ dq.T
    low = d[:8, :8].reshape(-1)[1:]  # drop DC
    # exact integer order statistic (np.median would round-trip int64
    # through float64, losing bits past 2^53 at this fixed-point scale)
    med = int(np.sort(low)[31])
    bits = 0
    for i, v in enumerate(low):
        if v > med:
            bits |= 1 << i
    return bits


def _dct2_int_matrix() -> "np.ndarray":
    """The 32-point orthonormal DCT-II basis on a 2^18 fixed-point
    lattice (int64), built once."""
    global _DCT2_INT
    try:
        return _DCT2_INT
    except NameError:
        pass
    _DCT2_INT = np.rint(_dct2_matrix(32) * (1 << 18)).astype(np.int64)
    return _DCT2_INT


def _memo_result_size(v) -> int:
    """Rough retained-bytes estimate of a memoized result: exact for
    the payload-sized cases (bytes in re-encoded outputs), constant for
    scalars — only the order of magnitude matters for the budget."""
    if v is None:
        return 16
    if isinstance(v, (bytes, bytearray, str)):
        return len(v) + 48
    if isinstance(v, (list, tuple)):
        return 48 + sum(_memo_result_size(x) for x in v)
    return 32


def _memo_by_payload(
    fn, max_entries: int = 4096, max_bytes: int = 64 * 1024 * 1024
):
    """Wrap a pure ``payload bytes -> result`` function (a fingerprint,
    a (family, fp) tuple, a re-encoded payload) with a PER-TASK bounded
    memo keyed on a 16-byte BLAKE2 digest of the payload.

    Decode is deterministic — identical bytes always produce the
    identical fingerprint — so a batch carrying exact-duplicate
    payloads (the normal crawl-ingest case: byte-identical re-uploads,
    mirrored files, and this repo's class-payload contract fixtures)
    pays ONE decode per distinct payload per task instead of one per
    row (guide §4.5: amortize heavyweight per-row work across the
    task). An all-distinct corpus pays one digest per row (memory-
    bandwidth cheap next to any codec walk) and the memo caps at
    ``max_entries`` results AND ``max_bytes`` of estimated retained
    result bytes, cleared when either trips — the byte budget matters
    for the wrappers whose results are payload-sized (resize_images /
    resample_audio / video_thumbnails re-encodes): on a distinct-heavy
    real-media corpus the entry cap alone would let one task retain
    gigabytes of re-encoded output (round-12 ADVICE). The memo lives
    inside one mapInPandas task invocation and never crosses tasks or
    runs: every query execution recomputes from the payload bytes."""
    cache: dict = {}
    held = 0

    def wrapped(b: bytes):
        nonlocal held
        k = hashlib.blake2b(b, digest_size=16).digest()
        try:
            return cache[k]
        except KeyError:
            pass
        v = fn(b)
        sz = _memo_result_size(v)
        if len(cache) >= max_entries or held + sz > max_bytes:
            cache.clear()
            held = 0
        if sz <= max_bytes:  # an over-budget single result is never held
            cache[k] = v
            held += sz
        return v

    return wrapped


def phash_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    decoder: str = "auto",
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Per-document perceptual hash over any decodable image payload
    (magic-sniff dispatch across BMP/PNG/JPEG/GIF by default): rows
    (doc_id, phash) with NULL phash for corrupt/unsupported payloads.
    ``keep_cols`` ride through the same mapInPandas pass unchanged —
    the streamed gate carries (lsn, delete flag) beside the hash
    without a batch-sized join back. CAVEAT: Arrow->pandas turns a
    nullable integer column into float64 BEFORE this code sees it (one
    NULL anywhere poisons the column; values past 2^53 lose bits) —
    route integer riders through strings, as `FingerprintIndexSink.
    _project` does. Downstream: exact grouping on
    phash dedups the same image across CONTAINERS (PNG vs BMP
    re-encodes of one crawl image), and :func:`phash_near_pairs` finds
    visually-near variants by banded Hamming join."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # resolve every helper through a WORKER-SIDE module import: the
        # executor then runs exactly the module the worker interpreter
        # loaded, never a driver-serialized copy of the closure's
        # captured globals
        from sqlserver_pg_cdc_spark.operators import multimodal as mm

        def _pixels(b: bytes) -> "np.ndarray | None":
            if decoder == "bmp":
                return mm._bmp_pixels(b)
            if decoder == "png":
                return mm._png_pixels(b)
            if decoder == "jpeg":
                return mm._jpeg_pixels(b)
            if decoder == "gif":
                got = mm._gif_frame(b)
                if got is None:
                    return None
                idx2, rgb = got
                return rgb[idx2]
            return mm.sniff_image_pixels(b)

        def _hash_of(b: bytes) -> "int | None":
            px = _pixels(b)
            return mm.phash_pixels(px) if px is not None else None

        # per-task decode memo: exact-duplicate payloads hash once
        hash_of = mm._memo_by_payload(_hash_of)

        for pdf in it:
            ids = []
            hashes = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else None
                ids.append(doc_id)
                hashes.append(hash_of(b) if b else None)
            # the hash column MUST be the nullable Int64 extension
            # dtype: a plain DataFrame constructor infers float64 for
            # int+None tuples, and a 63-bit fingerprint near 2^63
            # silently loses its low ~10 bits to the float mantissa —
            # same-pixel images then split by WHICH BATCH carried a
            # corrupt neighbor
            out = {
                "doc_id": ids,
                "phash": pd.array(hashes, dtype="Int64"),
            }
            for c in keep_cols:
                out[c] = pdf[c].reset_index(drop=True)
            yield pd.DataFrame(out)

    fields = [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("phash", T.LongType(), True),
    ] + [df.schema[c] for c in keep_cols]
    return df.select(
        F.col(id_col), F.col(payload_col), *[F.col(c) for c in keep_cols]
    ).mapInPandas(batches, T.StructType(fields))


_PHASH_BANDS = 7
_PHASH_BAND_BITS = 9  # 7 bands x 9 bits cover the 63-bit fingerprint


def phash_near_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_hamming: int = 6,
) -> DataFrame:
    """Visually-near image pairs by banded Hamming join on pHash —
    the SimHash pigeonhole (7 bands of 9 bits: full recall through
    Hamming <= 6), exact bit_count verify on candidates only. NULL
    hashes (undecodable images) drop out before the join."""
    fp = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("doc"), F.col(hash_col).alias("ph")
    )
    mask = (1 << _PHASH_BAND_BITS) - 1
    bands = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftrightunsigned(F.col("ph"), b * _PHASH_BAND_BITS)
            .bitwiseAND(mask)
            .alias("band_val"),
        )
        for b in range(_PHASH_BANDS)
    ]
    keyed = fp.select(
        "doc", "ph", F.explode(F.array(*bands)).alias("bk")
    ).select("doc", "ph", "bk.band_id", "bk.band_val")
    left = keyed.select(
        F.col("doc").alias("a"), F.col("ph").alias("ha"),
        "band_id", "band_val",
    )
    right = keyed.select(
        F.col("doc").alias("b"), F.col("ph").alias("hb"),
        "band_id", "band_val",
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    return (
        left.join(right, ["band_id", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def afp_samples(samples: "np.ndarray") -> "int | None":
    """Acoustic fingerprint of mono 16-bit PCM — the Haitsma-Kalker
    shape (energy-difference signs over a time x frequency grid),
    computed integer-exact: 8 time segments (index-map split), each
    downsampled to 128 points (exact integer grid), a FIXED-POINT
    128-point DCT (2^6 lattice, int64 — exact and order-independent,
    the phash discipline), 9 frequency bands of summed squared
    coefficients, and 63 bits = sign of the energy delta between
    consecutive segments per band (9 bands x 7 transitions).
    Identical samples fingerprint identically REGARDLESS of container
    (WAV vs FLAC vs any lossless path); perceptually-near audio lands
    within small Hamming distance. None for signals too short to
    segment (< 64 samples)."""
    x = np.asarray(samples, dtype=np.int64)
    n = len(x)
    if n < 64:
        return None
    d128 = _afp_dct_matrix()
    energies = np.empty((8, 9), dtype=np.int64)
    for s in range(8):
        seg = x[(s * n) // 8 : ((s + 1) * n) // 8]
        idx = (np.arange(128) * len(seg)) // 128
        g = seg[idx]
        coef = d128 @ g  # |coef| <= 2^15 * 2^6 * 128 = 2^28
        for b in range(9):
            band = coef[1 + b * 14 : 1 + (b + 1) * 14]  # skip DC
            energies[s, b] = int((band * band).sum())  # < 14 * 2^56
    bits = 0
    for b in range(9):
        for s in range(7):
            if energies[s + 1, b] > energies[s, b]:
                bits |= 1 << (b * 7 + s)
    return bits


def _afp_dct_matrix() -> "np.ndarray":
    """128-point orthonormal DCT-II on a 2^6 fixed-point lattice."""
    global _AFP_DCT
    try:
        return _AFP_DCT
    except NameError:
        pass
    j = np.arange(128)
    m = np.cos((2 * j[None, :] + 1) * j[:, None] * np.pi / 256)
    m *= math.sqrt(2.0 / 128)
    m[0] /= math.sqrt(2.0)
    _AFP_DCT = np.rint(m * (1 << 6)).astype(np.int64)
    return _AFP_DCT


def audio_fingerprints(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    decoder: str = "auto",
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Per-document acoustic fingerprint over any decodable audio
    payload (magic-sniff across WAV/FLAC/subband by default): rows
    (doc_id, afp) with NULL for corrupt/unsupported/too-short
    payloads. ``keep_cols`` ride through unchanged (the
    :func:`phash_images` gate discipline — including its CAVEAT: route
    nullable integer riders through strings). Downstream: exact grouping
    on afp dedups the same recording across CONTAINERS (a WAV and its
    FLAC re-encode are distinct byte hashes, one fingerprint), and
    :func:`phash_near_pairs` (any 63-bit fingerprint column) finds
    near-variants by banded Hamming join."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-side module resolution (the phash_images discipline)
        from sqlserver_pg_cdc_spark.operators import multimodal as mm

        def _samples(b: bytes) -> "np.ndarray | None":
            if decoder == "wav":
                got = mm.decode_wav_pcm16(b)
            elif decoder == "adpcm":
                got = mm.decode_wav_adpcm(b)
            elif decoder == "flac":
                got = mm.decode_flac(b)
            elif decoder == "subband":
                got = mm.decode_subband(b)
            else:
                return mm.sniff_audio_samples(b)
            return got[1] if got is not None else None

        def _afp_of(b: bytes) -> "int | None":
            sm = _samples(b)
            return mm.afp_samples(sm) if sm is not None else None

        # per-task decode memo: exact-duplicate payloads decode once
        afp_of = mm._memo_by_payload(_afp_of)

        for pdf in it:
            ids = []
            prints = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else None
                ids.append(doc_id)
                prints.append(afp_of(b) if b else None)
            # nullable Int64: the >2^53 fingerprint must never ride a
            # float64-inferred column (the phash regression)
            out = {"doc_id": ids, "afp": pd.array(prints, dtype="Int64")}
            for c in keep_cols:
                out[c] = pdf[c].reset_index(drop=True)
            yield pd.DataFrame(out)

    fields = [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("afp", T.LongType(), True),
    ] + [df.schema[c] for c in keep_cols]
    return df.select(
        F.col(id_col), F.col(payload_col), *[F.col(c) for c in keep_cols]
    ).mapInPandas(batches, T.StructType(fields))


def vhash_frames(frames: "list[np.ndarray]") -> "int | None":
    """Video fingerprint over sampled (H, W, 3) uint8 RGB frames: the
    video member of the 63-bit perceptual family (`phash_pixels`,
    `afp_samples`). Reduction, all integer-exact:

    1. temporal LUMA sum — BT.601 integer weights (66R + 129G + 25B),
       because both DCT codecs here (MCV inter-frame, MJPEG) quantize
       in YCbCr with full-resolution luma and 4:2:0 chroma: a channel-
       sum gray would inherit the chroma round-trip noise (measured
       ~2x the Hamming drift between re-encodes of one clip);
    2. exact 32x32 box-average pool (integral image; cell sums are
       exact rationals scaled x4 then floor-normalized by
       area*220*n_frames, landing the grid in the same ~0..1020 range
       `phash_pixels` feeds the shared core) — box pooling, not the
       image path's point sampling, because codec noise on a single
       sampled pixel moves the grid directly while a cell mean
       averages it away;
    3. the shared fixed-point DCT + exact-median threshold
       (:func:`_phash_of_grid`).

    FOLD RECALL (the design choice the banded index inherits): one
    63-bit fingerprint per CLIP from the temporally-summed luma, not
    per-frame fingerprints with any-frame-match banding. Measured on
    the contract clip law, MCV/MJPEG/AVI re-encodes of one clip land
    within Hamming <= 6 of each other — inside the 7x9-bit pigeonhole's
    full-recall bound — while distinct clips stay >= 12 apart. The
    tradeoff: a clip re-CUT (same scenes, different ordering/subset)
    shifts the temporal mean and may escape; the per-frame path
    (:func:`video_frame_fingerprints` + :func:`vframe_near_clip_pairs`,
    or ``granularity='frame'`` on the streaming index) catches it at
    'frames x bands' index rows per clip. None for an empty frame
    list."""
    if not frames:
        return None
    n = len(frames)
    acc = np.zeros(frames[0].shape[:2], dtype=np.int64)
    for px in frames:
        p = px.astype(np.int64)
        if p.shape[2] == 1:  # grayscale source
            acc += 220 * p[:, :, 0]
        else:
            acc += 66 * p[:, :, 0] + 129 * p[:, :, 1] + 25 * p[:, :, 2]
    sh, sw = acc.shape
    cs = np.zeros((sh + 1, sw + 1), dtype=np.int64)
    cs[1:, 1:] = acc.cumsum(0).cumsum(1)
    yb = (np.arange(33) * sh) // 32
    xb = (np.arange(33) * sw) // 32
    y0, y1 = yb[:-1], yb[1:]
    x0, x1 = xb[:-1], xb[1:]
    sums = (
        cs[np.ix_(y1, x1)] - cs[np.ix_(y0, x1)]
        - cs[np.ix_(y1, x0)] + cs[np.ix_(y0, x0)]
    )
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    if (area == 0).any():  # degenerate dims (< 32 px a side)
        return None
    g = (sums * 4) // (area * 220 * n)
    return _phash_of_grid(g)


def sample_frames_for_vhash(
    payload: bytes, decoder: str = "auto",
    stride: int = 1, max_frames: int = 8,
) -> "list[np.ndarray] | None":
    """Decode-and-sample for :func:`vhash_frames`: up to ``max_frames``
    frames, every ``stride``-th, from an MCV / AVI-MJPEG / MJPEG
    elementary payload (magic sniff under ``decoder="auto"``: MCV1
    header, RIFF+'AVI ', bare 0xFFD8 stream). Decode work is bounded
    by the sample budget — MCV reconstructs only the needed prefix
    (the `sample_video_frames` discipline); MJPEG/AVI decode only the
    sampled spans. None when the container does not parse; per-frame
    JPEG damage just drops that frame."""
    step = max(1, stride)
    b = payload
    kind = decoder
    if kind == "auto":
        if b[:4] == _MCV_MAGIC:
            kind = "mcv"
        elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            kind = "avi"
        elif b[:2] == b"\xff\xd8":
            kind = "mjpeg"
        else:
            return None
    if kind == "mcv":
        got = decode_mcv(b, max_frames=step * max_frames)
        if got is None:
            return None
        return got[3][::step][:max_frames]
    split_fn = split_avi_mjpeg if kind == "avi" else split_mjpeg
    spans = split_fn(b)
    if not spans:
        return None
    frames = []
    for s, e in spans[::step][:max_frames]:
        px = _jpeg_pixels(b[s:e])
        if px is not None:
            frames.append(px)
    return frames or None


def video_fingerprints(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    decoder: str = "auto",
    keep_cols: "tuple[str, ...]" = (),
    stride: int = 1,
    max_frames: int = 8,
) -> DataFrame:
    """Per-document video fingerprint over any decodable video payload
    (magic-sniff across MCV/AVI-MJPEG/MJPEG by default): rows
    (doc_id, vhash) with NULL for corrupt/unsupported payloads.
    ``keep_cols`` ride through unchanged (the :func:`phash_images`
    gate discipline — including its CAVEAT: route nullable integer
    riders through strings). Downstream: an MCV re-encode of an MJPEG
    clip — the video twin of the WAV/FLAC case — lands within Hamming
    <= 6 of the original under :func:`phash_near_pairs` banding; see
    :func:`vhash_frames` for the fold-recall contract. H.264/VP9-class
    compressed streams stay behind ``decoder="strict"`` (the
    `sample_video_frames` seam)."""
    if decoder == "strict":
        raise NotImplementedError(
            "compressed-codec video decoding requires ffmpeg-class "
            "libraries; not available in this environment"
        )
    if decoder not in ("auto", "mcv", "avi", "mjpeg"):
        raise ValueError(f"unknown video decoder {decoder!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-side module resolution (the phash_images discipline)
        from sqlserver_pg_cdc_spark.operators import multimodal as mm

        def _vhash_of(b: bytes) -> "int | None":
            fr = mm.sample_frames_for_vhash(
                b, decoder=decoder, stride=stride, max_frames=max_frames,
            )
            return mm.vhash_frames(fr) if fr is not None else None

        # per-task decode memo: exact-duplicate payloads decode once
        vhash_of = mm._memo_by_payload(_vhash_of)

        for pdf in it:
            ids = []
            prints = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else None
                ids.append(doc_id)
                prints.append(vhash_of(b) if b else None)
            # nullable Int64: the >2^53 fingerprint must never ride a
            # float64-inferred column (the phash regression)
            out = {"doc_id": ids, "vhash": pd.array(prints, dtype="Int64")}
            for c in keep_cols:
                out[c] = pdf[c].reset_index(drop=True)
            yield pd.DataFrame(out)

    fields = [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("vhash", T.LongType(), True),
    ] + [df.schema[c] for c in keep_cols]
    return df.select(
        F.col(id_col), F.col(payload_col), *[F.col(c) for c in keep_cols]
    ).mapInPandas(batches, T.StructType(fields))


def video_frame_fingerprints(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    decoder: str = "auto",
    keep_cols: "tuple[str, ...]" = (),
    stride: int = 1,
    max_frames: int = 8,
) -> DataFrame:
    """PER-FRAME video fingerprints — the recall path the clip-level
    fold (`video_fingerprints`) documents as its tradeoff: one 63-bit
    pHash PER SAMPLED FRAME (`vhash_frames` over a single frame — the
    identical luma/box-pool/DCT core, so a frame's hash is independent
    of which clip, position, or sampling budget carried it). Rows
    (doc_id, fhashes array<long>) with frame order preserved; NULL for
    corrupt/unsupported payloads, undecodable individual frames are
    dropped from the array (an empty array reads NULL — it can never
    collide).

    Clip-level duplication is then >= k matching frames
    (:func:`vframe_near_clip_pairs`): a re-CUT — same scenes, trimmed
    or reordered — that shifts the temporal mean out of the single
    fold's Hamming band still shares per-frame fingerprints, at the
    cost of frames x bands index rows per clip instead of bands.
    Decode stays sample-budget-bounded exactly as the clip fold
    (MCV reconstructs only the sampled prefix)."""
    if decoder == "strict":
        raise NotImplementedError(
            "compressed-codec video decoding requires ffmpeg-class "
            "libraries; not available in this environment"
        )
    if decoder not in ("auto", "mcv", "avi", "mjpeg"):
        raise ValueError(f"unknown video decoder {decoder!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sqlserver_pg_cdc_spark.operators import multimodal as mm

        def _fhashes_of(b: bytes) -> "list[int] | None":
            fr = mm.sample_frames_for_vhash(
                b, decoder=decoder, stride=stride, max_frames=max_frames,
            )
            if fr is None:
                return None
            hs = [
                h for h in (mm.vhash_frames([f]) for f in fr)
                if h is not None
            ]
            return hs or None

        # per-task decode memo: exact-duplicate payloads decode once
        # (the memoized list is never mutated — it only rides into
        # Arrow serialization)
        fhashes_of = mm._memo_by_payload(_fhashes_of)

        for pdf in it:
            ids = []
            prints = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else None
                ids.append(doc_id)
                prints.append(fhashes_of(b) if b else None)
            # array<long> elements are exact int64 end to end (no
            # scalar Int64-inference trap: object lists of python
            # ints cross Arrow as list<int64>)
            out = {"doc_id": ids, "fhashes": prints}
            for c in keep_cols:
                out[c] = pdf[c].reset_index(drop=True)
            yield pd.DataFrame(out)

    fields = [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fhashes", T.ArrayType(T.LongType()), True),
    ] + [df.schema[c] for c in keep_cols]
    return df.select(
        F.col(id_col), F.col(payload_col), *[F.col(c) for c in keep_cols]
    ).mapInPandas(batches, T.StructType(fields))


def vframe_near_clip_pairs(
    frames: DataFrame,
    id_col: str = "doc_id",
    fhashes_col: str = "fhashes",
    max_hamming: int = 6,
    min_frames: int = 2,
) -> DataFrame:
    """Clip-level near-duplicate pairs from PER-FRAME fingerprints:
    two clips are near-dups when at least ``min_frames`` of their
    sampled frames match within ``max_hamming`` — the any-frame-match
    law that catches re-cuts the single temporal fold misses.

    Plan shape (the 100 TB contract): posexplode to
    (doc, frame_id, fh) — frames x rows per clip, bounded by the
    sample budget — then the SAME 7x9-bit banded pigeonhole as
    `phash_near_pairs` (full recall through Hamming <= max_hamming 6,
    no all-pairs), exact bit_count verify on band candidates only,
    and ONE aggregation per surviving clip pair. Matched-frame count
    is the SYMMETRIC minimum of distinct matched frames on each side,
    so one static scene repeated across a clip cannot inflate the
    overlap. Returns (a, b, n_frames, hamming) with a < b, hamming =
    the pair's best frame match."""
    fp = frames.filter(F.col(fhashes_col).isNotNull()).select(
        F.col(id_col).alias("doc"),
        F.posexplode(fhashes_col).alias("frame_id", "fh"),
    )
    mask = (1 << _PHASH_BAND_BITS) - 1
    bands = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftrightunsigned(F.col("fh"), b * _PHASH_BAND_BITS)
            .bitwiseAND(mask)
            .alias("band_val"),
        )
        for b in range(_PHASH_BANDS)
    ]
    keyed = fp.select(
        "doc", "frame_id", "fh", F.explode(F.array(*bands)).alias("bk")
    ).select("doc", "frame_id", "fh", "bk.band_id", "bk.band_val")
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    frame_pairs = (
        keyed.select(
            F.col("doc").alias("a"), F.col("frame_id").alias("fa"),
            F.col("fh").alias("ha"), "band_id", "band_val",
        )
        .join(
            keyed.select(
                F.col("doc").alias("b"), F.col("frame_id").alias("fb"),
                F.col("fh").alias("hb"), "band_id", "band_val",
            ),
            ["band_id", "band_val"],
        )
        .filter(F.col("a") < F.col("b"))
        .select("a", "fa", "b", "fb", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        # no .distinct(): a frame pair matched in several bands emits
        # duplicate rows, but the aggregation below is duplicate-
        # insensitive (countDistinct / min) — the dedup exchange was a
        # full extra shuffle of the candidate set for nothing
    )
    return (
        frame_pairs.groupBy("a", "b")
        .agg(
            F.least(
                F.countDistinct("fa"), F.countDistinct("fb")
            ).cast("long").alias("n_frames"),
            F.min("hamming").alias("hamming"),
        )
        .filter(F.col("n_frames") >= min_frames)
    )


def sniff_image_pixels(b: bytes) -> "np.ndarray | None":
    """Magic-sniff image decode to (H, W, C) pixels — the
    ``decoder="auto"`` path of :func:`phash_images`."""
    if b[:2] == b"BM":
        return _bmp_pixels(b)
    if b[: len(_PNG_SIG)] == _PNG_SIG:
        return _png_pixels(b)
    if b[:4] == b"GIF8":
        got = _gif_frame(b)
        if got is None:
            return None
        idx2, rgb = got
        return rgb[idx2]
    if b[:2] == b"\xff\xd8":
        return _jpeg_pixels(b)
    return None


def sniff_audio_samples(b: bytes) -> "np.ndarray | None":
    """Magic-sniff audio decode to mono int16 samples — the
    ``decoder="auto"`` path of :func:`audio_fingerprints`."""
    if b[:4] == b"RIFF" and b[8:12] != b"AVI ":
        got = decode_wav_pcm16(b) or decode_wav_adpcm(b)
    elif b[:4] == b"fLaC":
        got = decode_flac(b)
    elif b[:4] == _SB_MAGIC:
        got = decode_subband(b)
    else:
        got = None
    return got[1] if got is not None else None


def sniff_media_family(b: "bytes | None") -> "str | None":
    """Container-class sniff for mixed-media streams: 'image'
    (BMP/PNG/GIF/JPEG), 'audio' (WAV/ADPCM RIFF+WAVE, FLAC, subband),
    'video' (MCV, RIFF+'AVI '), or None. A bare 0xFFD8 payload is
    ambiguous by construction (a JPEG image IS a one-frame MJPEG
    elementary stream); it sniffs as 'image' when the marker walk
    finds one frame and 'video' for a multi-frame stream — a
    single-frame MJPEG wrapped in AVI still sniffs 'video' (the
    container states intent)."""
    if b is None or len(b) < 12:
        return None
    if b[:4] == _MCV_MAGIC:
        return "video"
    if b[:4] == b"RIFF":
        if b[8:12] == b"AVI ":
            return "video"
        if b[8:12] == b"WAVE":
            return "audio"
        return None
    if b[:2] == b"BM" or b[: len(_PNG_SIG)] == _PNG_SIG or b[:4] == b"GIF8":
        return "image"
    if b[:4] == b"fLaC" or b[:4] == _SB_MAGIC:
        return "audio"
    if b[:2] == b"\xff\xd8":
        return "image" if len(split_mjpeg(b)) <= 1 else "video"
    return None


def media_fingerprints(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    keep_cols: "tuple[str, ...]" = (),
    stride: int = 1,
    max_frames: int = 8,
) -> DataFrame:
    """Mixed-media fingerprinting in ONE Arrow pass: each payload is
    container-sniffed (:func:`sniff_media_family`) and fingerprinted
    with its family's member of the 63-bit perceptual family — pHash
    for images, acoustic fingerprint for audio, video hash for video.
    Rows (doc_id, family, fp); family/fp NULL for unrecognized or
    corrupt payloads. Fingerprints are only comparable WITHIN a
    family — a pHash and an AFP at small Hamming distance mean
    nothing — so every downstream band join must include ``family``
    in its key, as `streaming/media.FingerprintIndexSink` does.
    ``keep_cols`` ride through unchanged (integer riders as strings —
    the `functions/riders` discipline)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-side module resolution (the phash_images discipline)
        from sqlserver_pg_cdc_spark.operators import multimodal as mm

        def _fam_fp_of(b: bytes) -> "tuple[str | None, int | None]":
            fam = mm.sniff_media_family(b)
            fp = None
            if fam == "image":
                px = mm.sniff_image_pixels(b)
                fp = mm.phash_pixels(px) if px is not None else None
            elif fam == "audio":
                sm = mm.sniff_audio_samples(b)
                fp = mm.afp_samples(sm) if sm is not None else None
            elif fam == "video":
                fr = mm.sample_frames_for_vhash(
                    b, stride=stride, max_frames=max_frames
                )
                fp = mm.vhash_frames(fr) if fr is not None else None
            return (fam if fp is not None else None, fp)

        # per-task decode memo: exact-duplicate payloads decode once
        fam_fp_of = mm._memo_by_payload(_fam_fp_of)

        for pdf in it:
            ids = []
            fams = []
            prints = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else None
                fam, fp = fam_fp_of(b) if b else (None, None)
                ids.append(doc_id)
                fams.append(fam)
                prints.append(fp)
            out = {
                "doc_id": ids,
                "family": pd.array(fams, dtype="string"),
                # nullable Int64: >2^53 fingerprints must never ride a
                # float64-inferred column (the phash regression)
                "fp": pd.array(prints, dtype="Int64"),
            }
            for c in keep_cols:
                out[c] = pdf[c].reset_index(drop=True)
            yield pd.DataFrame(out)

    fields = [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("family", T.StringType(), True),
        T.StructField("fp", T.LongType(), True),
    ] + [df.schema[c] for c in keep_cols]
    return df.select(
        F.col(id_col), F.col(payload_col), *[F.col(c) for c in keep_cols]
    ).mapInPandas(batches, T.StructType(fields))
