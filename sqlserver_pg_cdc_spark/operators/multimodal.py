"""Multimodal (image/audio/video) column plumbing.

Convention: a modality is an opaque ``binary`` payload column plus a typed
metadata struct (``mime``, byte length, modality-specific fields). The
Spark-side machinery — schemas, partition-sized Arrow batches through
``mapInPandas``, byte-level featurization — is real and tested, and so
are three pure-Python codecs that need no image/audio library: 24-bpp
BMP, 8-bit RGB/RGBA PNG (stdlib zlib + per-spec unfiltering), and
16-bit PCM WAV. Formats that genuinely require a codec library remain
explicit stubs:

- with ``decoder="strict"`` the decode raises NotImplementedError,
  exactly where Pillow/torchaudio/ffmpeg would be called (JPEG, MP3);
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
# 16-bit PCM WAV, and (below) 8-bit truecolor PNG. These make
# decode_images / sample_audio_frames REAL decoders — header parse,
# padding, inflate, unfilter, pixel math — while formats needing a codec
# library (JPEG/MP3) stay behind decoder="strict".
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
    total = 0
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
        total += int(line.sum())
        prev = line
    return width, height, channels, total, stride * height


def sniff_decode_image(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """Magic-byte dispatch to the real codecs (BMP, PNG); None for
    anything else. The ``decoder="auto"`` path of :func:`decode_images`."""
    if payload is None or len(payload) < 8:
        return None
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
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
    - ``decoder="auto"``: magic-byte dispatch across the real codecs
      (BMP, PNG); anything else yields NULLs.
    - ``decoder="fake"``: deterministic dims/mean from the payload hash
      (plumbing tests without any codec assumption).
    - ``decoder="strict"``: raises where a compressed-format codec
      (Pillow/ffmpeg) would be called for formats still out of scope
      (JPEG, ...); those libs aren't in this environment."""
    real = {"bmp": decode_bmp, "png": decode_png, "auto": sniff_decode_image}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
                    parsed = real[decoder](bytes(payload))
                    if parsed is None:
                        rows.append((doc_id, None, None, None, None))
                    else:
                        w, h, ch, px_sum, n_px = parsed
                        rows.append((doc_id, w, h, ch, px_sum / (n_px * 255)))
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
    hash-parity discipline. Non-WAV payloads are skipped."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
                b = bytes(payload)
                if decoder == "wav":
                    parsed = decode_wav_pcm16(b)
                    if parsed is None:
                        continue
                    rate, samples = parsed
                    spf = max(1, rate * frame_ms // 1000)
                    n_frames = min(max_frames, max(1, -(-len(samples) // spf)))
                    for i in range(n_frames):
                        chunk = samples[i * spf : (i + 1) * spf]
                        if len(chunk) == 0:
                            break
                        sq = int(np.sum(chunk.astype(np.int64) ** 2))
                        # math.sqrt is correctly-rounded IEEE754, same as
                        # SQL sqrt() — bit-identical for oracle hashing
                        rows.append(
                            (doc_id, i, i * frame_ms, math.sqrt(sq / len(chunk)))
                        )
                    continue
                n_frames = min(max_frames, max(1, len(b) // 64))
                for i in range(n_frames):
                    chunk = b[i * 64 : (i + 1) * 64] or b"\0"
                    rms = (sum(x * x for x in chunk) / len(chunk)) ** 0.5
                    rows.append((doc_id, i, i * frame_ms, rms))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_offset_ms", "rms"]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, AUDIO_FRAMES_SCHEMA
    )


def resize_images_stub(
    df: DataFrame, id_col: str, payload_col: str, width: int, height: int
) -> DataFrame:
    """Resize is pure codec work — strict stub only; returns the payload
    untouched with target dims recorded so pipelines can be wired now and
    lit up when a codec lands."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires an image library; not available here"
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
