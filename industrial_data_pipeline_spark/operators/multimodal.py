"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly
layout, Arrow-batched mapInPandas UDF signatures, deterministic batch
shapes. The actual codec work (JPEG decode, resampling, frame
extraction) requires libraries not present in this container, so the
decode kernel is STUBBED: ``decode_stub=True`` (default) produces
deterministic fake features derived from the bytes' md5 — stable for
tests — while ``decode_stub=False`` raises NotImplementedError at the
point where Pillow/ffmpeg/torchcodec would be called.

Design for 100 TB of media:
- binary payloads live in their own parquet column; metadata columns
  (kind, width, height, duration_ms, sample_rate) are scalar and
  prunable — a metadata-only query never touches the bytes
  (parquet column pruning).
- feature extraction is ``mapInPandas`` over Arrow record batches:
  per-batch vectorized Python, no per-row serde; batch size bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
  stays flat regardless of payload size skew.
- frame sampling emits multiple rows per input (iterator-of-batches
  API), keeping the expansion streaming rather than materialized.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("data", T.BinaryType(), True),          # opaque payload
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
])

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])

FRAMES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_ms", T.LongType(), False),
    T.StructField("frame_hash", T.StringType(), False),
])


def _fake_feature(payload: bytes | None) -> list[float] | None:
    """Deterministic stand-in for a real encoder: FEATURE_DIM doubles
    in [0,1) from the payload's md5."""
    if payload is None:
        return None
    h = hashlib.md5(bytes(payload)).digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(df: DataFrame,
                     decode_stub: bool = True) -> DataFrame:
    """media → feature vectors, Arrow-batched."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real decode needs Pillow/ffmpeg — not in this "
                    "container; run with decode_stub=True")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": pdf["data"].map(_fake_feature),
            })

    return df.mapInPandas(op, FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  max_frames: int = 16,
                  decode_stub: bool = True) -> DataFrame:
    """video rows → one row per sampled frame (streaming expansion)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame extraction needs ffmpeg — not in this "
                    "container; run with decode_stub=True")
            out = {"media_id": [], "frame_idx": [], "frame_ms": [],
                   "frame_hash": []}
            for _, row in pdf.iterrows():
                dur = int(row["duration_ms"] or 0)
                n = min(max(dur // every_ms, 0) + 1, max_frames)
                payload = bytes(row["data"] or b"")
                for i in range(n):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    # payload:index — deterministic fake fingerprint a
                    # SQL oracle can replay (md5 over text)
                    out["frame_hash"].append(hashlib.md5(
                        payload + b":" + str(i).encode()).hexdigest())
            yield pd.DataFrame(out)

    return df.where("kind = 'video'").mapInPandas(op, FRAMES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  decode_stub: bool = True) -> DataFrame:
    """image rows → resized payloads. Stub keeps bytes, updates the
    metadata columns (the real kernel would re-encode)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real resize needs Pillow — not in this container; "
                    "run with decode_stub=True")
            pdf = pdf.copy()
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.where("kind = 'image'").mapInPandas(op, MEDIA_SCHEMA)
