"""Multimodal column operators (image/audio/video as opaque binary).

The Spark-side plumbing is real and tested — schemas, partitioning, Arrow
batch shapes, ``mapInPandas`` signatures.  The *codec* step is stubbed:
this container ships no image/audio libraries, so ``decode_image`` raises
``NotImplementedError`` unless a deterministic fake is requested.  Swapping
the stub for PIL/ffmpeg is a one-function change; everything around it
(batching, schema, metadata propagation) is production-shaped.

Pattern (north rule §multimodal): binary payload column + typed metadata
struct; heavy per-item work in Arrow-batched ``mapInPandas`` with
size-bounded batches, exactly like the HTML extractor.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("payload", BinaryType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), True),
    StructField("kind", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("fingerprint", StringType(), True),  # md5 — DuckDB-reproducible
    StructField("features", ArrayType(FloatType()), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("error", StringType(), True),
])


def synthetic_media_df(spark, documents: DataFrame) -> DataFrame:
    """Deterministic fake media table: payload = UTF-8 bytes of the doc text
    (opaque binary as far as the pipeline is concerned)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def decode_image(payload: bytes, *, fake: bool = False) -> tuple[int, int, bytes]:
    """STUB — real decode needs an image library not present in this
    container.  ``fake=True`` returns a deterministic pseudo-decode
    (dimensions derived from the byte length) for plumbing tests."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips; not available in this environment"
        )
    n = len(payload)
    width = (n % 640) + 16
    height = (n % 480) + 16
    return width, height, payload


def _byte_histogram_features(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic fake feature extractor: normalized byte histogram."""
    if not payload:
        return [0.0] * dims
    buckets = [0] * dims
    for b in payload:
        buckets[b * dims // 256] += 1
    total = len(payload)
    return [round(c / total, 6) for c in buckets]


def resize_image(payload: bytes, width: int, height: int, *, fake: bool = False) -> bytes:
    """STUB — real resize needs PIL/libvips (absent here).  ``fake=True``
    returns a deterministic truncation/padding to width*height bytes so the
    batch plumbing (shapes, schemas) is testable."""
    if not fake:
        raise NotImplementedError("image resize requires PIL/libvips")
    need = width * height
    return (payload * (need // max(len(payload), 1) + 1))[:need]


def sample_frames(payload: bytes, every_n: int = 10, *, fake: bool = False) -> list[bytes]:
    """STUB — real frame sampling needs ffmpeg (absent).  ``fake=True``
    treats the payload as fixed-size pseudo-frames and returns every n-th."""
    if not fake:
        raise NotImplementedError("frame sampling requires ffmpeg")
    frame_size = 64
    frames = [payload[i : i + frame_size] for i in range(0, len(payload), frame_size)]
    return frames[::every_n]


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), True),
    StructField("frame_idx", IntegerType(), True),
    StructField("frame", BinaryType(), True),
])


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """video rows → one row per sampled frame (explode shape: the Arrow
    batches carry binary frames, the downstream feature extractor reuses
    extract_media_features' discipline)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {f.name: [] for f in FRAME_SCHEMA.fields}
            for i in range(len(pdf)):
                if pdf["kind"].iat[i] != "video":
                    continue
                raw = pdf["payload"].iat[i]
                raw = bytes(raw) if raw is not None else b""
                for idx, frame in enumerate(sample_frames(raw, every_n, fake=True)):
                    out["media_id"].append(pdf["media_id"].iat[i])
                    out["frame_idx"].append(idx)
                    out["frame"].append(frame)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


def extract_media_features(media: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """media(media_id, kind, payload:binary) → features frame via Arrow
    batches.  Mirrors the HTML extractor's batch discipline: one output row
    per input row, failures as an ``error`` column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {f.name: [] for f in FEATURE_SCHEMA.fields}
            for i in range(len(pdf)):
                mid = pdf["media_id"].iat[i]
                kind = pdf["kind"].iat[i]
                raw = pdf["payload"].iat[i]
                raw = bytes(raw) if raw is not None else b""
                err = None
                width = height = None
                try:
                    if kind == "image":
                        width, height, _ = decode_image(raw, fake=fake_decode)
                except NotImplementedError:
                    err = "decoder_unavailable"
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(raw))
                out["fingerprint"].append(hashlib.md5(raw).hexdigest())
                out["features"].append(_byte_histogram_features(raw))
                out["width"].append(width)
                out["height"].append(height)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )
