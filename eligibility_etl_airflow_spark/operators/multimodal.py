"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; Spark-side plumbing (schema, partitioning, Arrow batch
shape) is real and tested. The actual media decode is STUBBED — the
container has no PIL/ffmpeg — behind an import-gate: real decoders plug
into ``decode_features`` via the ``decoder`` argument; the deterministic
fake ships for tests.

Scale notes: binary payloads dominate row size → mapInPandas batches are
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``; feature
extraction keys its shuffle on nothing (narrow map); fetch-on-demand
layouts (metadata row + object-store pointer) drop straight into this
schema by making the binary column nullable.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # real image decoding is optional; the container ships without it
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

# magic-byte prefixes → format tag (hex, uppercase)
_MAGIC = [
    ("FFD8FF", "jpeg"),
    ("89504E47", "png"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi container
    ("494433", "mp3"),
]


def sniff_format(binary_col: Column) -> Column:
    """Format tag from magic bytes — pure column expression."""
    prefix = F.upper(F.hex(F.substring(binary_col, 1, 4)))
    out = F.lit("unknown")
    for magic, tag in reversed(_MAGIC):
        out = F.when(prefix.startswith(magic), tag).otherwise(out)
    return out


def binary_metadata(binary_col: Column) -> Column:
    """Typed metadata struct computed without decoding."""
    return F.struct(
        F.length(binary_col).cast("long").alias("n_bytes"),
        sniff_format(binary_col).alias("format"),
        F.substring(F.upper(F.hex(F.substring(binary_col, 1, 8))), 1, 16).alias("header_hex"),
        F.md5(binary_col).alias("content_md5"),
    )


def fake_decoder(payload: bytes) -> list[float]:
    """Deterministic stand-in for an image/audio feature extractor:
    8-bin byte histogram (normalized) + mean byte value. Replaces the
    real decode in tests; same signature as a production decoder."""
    if not payload:
        return [0.0] * 9
    counts = [0] * 8
    total = 0
    for byte in payload:
        counts[byte >> 5] += 1
        total += byte
    n = len(payload)
    return [round(c / n, 6) for c in counts] + [round(total / n, 6)]


def real_image_decoder(payload: bytes) -> list[float]:
    """Production image decode → features. Requires PIL."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL, which is not installed in this "
            "container; inject fake_decoder or ship a decoder dependency"
        )
    raise NotImplementedError("wire a real model here (resize→embed)")


def decode_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    decoder: Callable[[bytes], list[float]] = fake_decoder,
    feature_dim: int = 9,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    One Python call per Arrow batch; the decoder sees raw bytes and
    returns a fixed-dim feature list (schema declared, so downstream
    similarity search composes directly).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(p)) if p is not None else None for p in pdf[binary_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, binary_col).mapInPandas(
        run, schema=f"{id_col} long, features array<double>"
    )


def frame_sample_plan(df: DataFrame, binary_col: str, every_n_bytes: int = 1024) -> DataFrame:
    """Video frame-sampling STUB: emits (offset) rows per payload — the
    partitioning/explode shape of frame extraction with the actual codec
    behind the same decoder seam as ``decode_features``."""
    n = F.length(F.col(binary_col)).cast("long")
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return df.where(F.col(binary_col).isNotNull()).withColumn(
        "frame_offset", F.explode_outer(offsets)
    )


def fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: truncates/cycles the
    payload to width*height bytes (a real resizer decodes, resamples,
    re-encodes behind the same signature)."""
    target = max(width * height, 1)
    if not payload:
        return bytes(target)
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def resize_images(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] = fake_resizer,
) -> DataFrame:
    """Arrow-batched image resize over binary payloads — the third leg of
    the decode/feature/resize seam family. Output is again an opaque
    binary column + metadata, so resize → decode_features composes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                resizer(bytes(p), width, height) if p is not None else None
                for p in pdf[binary_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "resized": resized})

    return df.select(id_col, binary_col).mapInPandas(
        run, schema=f"{id_col} long, resized binary"
    )
