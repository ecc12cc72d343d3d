"""Multimodal (image/audio/video) column plumbing.

Convention: a modality is an opaque ``binary`` payload column plus a typed
metadata struct (``mime``, byte length, modality-specific fields). The
Spark-side machinery — schemas, partition-sized Arrow batches through
``mapInPandas``, byte-level featurization — is real and tested; the
codec step itself is stubbed because no image/audio libraries exist in
this container:

- with ``decoder="strict"`` the decode raises NotImplementedError,
  exactly where Pillow/torchaudio/ffmpeg would be called;
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
from typing import Iterator

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


def decode_images(
    df: DataFrame, id_col: str, payload_col: str, decoder: str = "fake"
) -> DataFrame:
    """Arrow-batched image decode -> (doc_id, width, height, channels,
    mean_pixel). ``decoder="strict"`` raises where the real codec goes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "strict":
                raise NotImplementedError(
                    "image decoding requires an image library (e.g. Pillow); "
                    "not available in this environment"
                )
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None or len(payload) == 0:
                    rows.append((doc_id, None, None, None, None))
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
    (the mapInPandas shape real audio pipelines use)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "strict":
                raise NotImplementedError(
                    "audio decoding requires an audio library; "
                    "not available in this environment"
                )
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
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
