"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; Spark-side plumbing (schema, partitioning, Arrow batch
shape) is real and tested. Decode is REAL for the dependency-free
formats — PCM16 WAV via the stdlib ``wave`` module and uncompressed
24-bit BMP via a struct/numpy parser (``real_media_decoder``); only
compressed codecs (jpeg/png/mp3/video) stay behind the PIL/ffmpeg
import gate, pluggable through ``decode_features``'s ``decoder``
argument (the deterministic fake ships for tests of that seam).

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
    ("424D", "bmp"),
]


def sniff_format(binary_col: Column) -> Column:
    """Format tag from magic bytes — pure column expression."""
    prefix = F.upper(F.hex(F.substring(binary_col, 1, 4)))
    out = F.lit("unknown")
    for magic, tag in reversed(_MAGIC):
        out = F.when(prefix.startswith(magic), tag).otherwise(out)
    return out


def sniff_format_py(payload: bytes) -> str:
    """Python twin of :func:`sniff_format` for fused Python stages —
    same ``_MAGIC`` table, same first-match-wins semantics (parity is
    test-pinned in tests/test_multimodal.py). Use when a mapInPandas
    stage already holds the payload bytes and a round-trip through a
    JVM column expression would force an extra Python boundary."""
    prefix = payload[:4].hex().upper()
    for magic, tag in _MAGIC:
        if prefix.startswith(magic):
            return tag
    return "unknown"


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
    """Production compressed-image decode → features. Requires PIL;
    uncompressed BMP decodes for real without it (``bmp_features``)."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "jpeg/png/gif decoding requires PIL, which is not installed in "
            "this container; BMP and WAV decode for real via "
            "real_media_decoder; inject fake_decoder for other formats"
        )
    raise NotImplementedError("wire a real model here (resize→embed)")


# --------------------------------------------------------------------------
# REAL decoders — dependency-free formats (stdlib wave + struct/numpy).
# These actually parse the container and the sample/pixel data; the
# import-gated stubs above remain only for compressed codecs.
# --------------------------------------------------------------------------


def encode_wav_pcm16(samples, sample_rate: int, n_channels: int = 1) -> bytes:
    """PCM16 WAV encoder (stdlib ``wave``): float samples in [-1, 1] →
    RIFF/WAVE bytes. Test-vehicle twin of ``decode_wav``."""
    import io
    import wave as _wave

    import numpy as np

    pcm = (np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0) * 32767.0).astype(
        "<i2"
    )
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """Real WAV decode (stdlib ``wave``): returns
    ``(sample_rate, n_channels, samples)`` with samples as float64 in
    [-1, 1], shape (n_frames, n_channels)."""
    import io
    import wave as _wave

    import numpy as np

    with _wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only PCM16 WAV supported, got sampwidth={w.getsampwidth()}"
            )
        rate, nch = w.getframerate(), w.getnchannels()
        raw = w.readframes(w.getnframes())
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
    return rate, nch, samples.reshape(-1, nch)


def audio_features(payload: bytes) -> list[float]:
    """Real audio feature extraction from a WAV payload: decode PCM and
    compute signal statistics (RMS energy, zero-crossing rate, peak,
    DC offset). 9-dim, kind tag 1.0 — same shape as ``bmp_features`` so
    mixed-modality feature columns stay fixed-width."""
    import numpy as np

    rate, nch, frames = decode_wav(payload)
    mono = frames.mean(axis=1)
    n = len(mono)
    if n == 0:
        return [1.0, 0.0, float(rate), float(nch), 0.0, 0.0, 0.0, 0.0, 0.0]
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    return [
        1.0,
        float(n),
        float(rate),
        float(nch),
        round(n / rate, 6),
        round(rms, 6),
        round(zcr, 6),
        round(float(np.abs(mono).max()), 6),
        round(float(mono.mean()), 6),
    ]


def encode_bmp_rgb24(pixels) -> bytes:
    """Uncompressed 24-bit BMP encoder (pure struct/numpy): (H, W, 3)
    uint8 RGB → BMP bytes (BGR order, bottom-up rows, 4-byte padding —
    the real on-disk format, byte for byte)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = b"".join(
        px[r, :, ::-1].tobytes() + b"\x00" * pad for r in range(h - 1, -1, -1)
    )
    pixel_offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", pixel_offset + len(body), 0, 0, pixel_offset
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


def decode_bmp(payload: bytes):
    """Real BMP decode (pure struct/numpy): parses the file + info
    headers and the pixel array; returns (H, W, 3) uint8 RGB. Only the
    uncompressed 24-bit BITMAPINFOHEADER layout is supported — anything
    else raises rather than guessing."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = []
    for r in range(h):
        off = pixel_offset + r * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=row_bytes, offset=off)
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR → RGB
    px = np.stack(rows[::-1] if bottom_up else rows)
    return px


def bmp_features(payload: bytes) -> list[float]:
    """Real image feature extraction from a BMP payload: decode pixels
    and compute channel means + luminance stats. 9-dim, kind tag 2.0."""
    import numpy as np

    px = decode_bmp(payload).astype(np.float64)
    h, w, _ = px.shape
    lum = 0.2126 * px[..., 0] + 0.7152 * px[..., 1] + 0.0722 * px[..., 2]
    return [
        2.0,
        float(w),
        float(h),
        3.0,
        round(float(px[..., 0].mean()), 6),
        round(float(px[..., 1].mean()), 6),
        round(float(px[..., 2].mean()), 6),
        round(float(lum.mean()), 6),
        round(float(lum.std()), 6),
    ]


def real_media_decoder(payload: bytes) -> list[float]:
    """Dispatching REAL decoder: WAV (RIFF) and BMP payloads are parsed
    for real (stdlib wave / struct+numpy — no optional deps); compressed
    codecs still require PIL/ffmpeg and raise through the import gate.
    Drop-in for ``decode_features``'s ``decoder`` argument."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return audio_features(payload)
    if payload[:2] == b"BM":
        return bmp_features(payload)
    return real_image_decoder(payload)


def decode_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    decoder: Callable[[bytes], list[float]] = fake_decoder,
    feature_dim: int = 9,
    passthrough_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    One Python call per Arrow batch; the decoder sees raw bytes and
    returns a fixed-dim feature list (schema declared, so downstream
    similarity search composes directly). ``passthrough_cols`` ride
    through the Python stage unchanged — use this instead of joining
    features back onto the source when the source lineage is expensive
    (a join makes Spark recompute the upstream plan for both sides)."""
    pass_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in passthrough_cols
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(p)) if p is not None else None for p in pdf[binary_col]]
            out = {id_col: pdf[id_col], "features": feats}
            for c in passthrough_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col, *passthrough_cols).mapInPandas(
        run, schema=f"{id_col} long, features array<double>{pass_schema}"
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


def resize_nearest(pixels: "object", out_h: int, out_w: int) -> "object":
    """REAL nearest-neighbor resample of an (h, w, 3) uint8 pixel array —
    pure numpy index gather, no PIL. Source index for output row r is
    floor(r·h/out_h) (the standard box-anchor mapping), so upscale and
    downscale both work and a same-size call is the identity."""
    import numpy as np

    h, w = pixels.shape[0], pixels.shape[1]
    if h == 0 or w == 0 or out_h <= 0 or out_w <= 0:
        raise ValueError(f"bad resize {h}x{w} -> {out_h}x{out_w}")
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return pixels[rows][:, cols]


def bmp_resizer(payload: bytes, width: int, height: int) -> bytes:
    """REAL resizer for uncompressed BMP payloads: decode → nearest-
    neighbor resample → re-encode. Drop-in for ``resize_images``'s
    ``resizer`` argument, so the whole resize path (Arrow batching,
    schema, null handling) runs against genuine image bytes; compressed
    codecs keep the PIL import gate via ``fake_resizer``/
    ``real_image_decoder``."""
    return encode_bmp_rgb24(resize_nearest(decode_bmp(payload), height, width))


# --------------------------------------------------------------------------
# Perceptual image hashing + near-duplicate pairs
# --------------------------------------------------------------------------


def _luminance_grid(payload: bytes, rows: int, cols: int):
    """Decode a BMP and nearest-sample its luminance onto a rows×cols
    grid. Nearest sampling (index = floor(i·H/rows)) is deterministic
    and exactly scale-invariant for integer upscales — a 2× nearest
    upscale of an image lands on the same sample pixels, so its
    perceptual hash is bit-identical to the original's."""
    import numpy as np

    px = decode_bmp(payload).astype(np.float64)
    lum = 0.2126 * px[..., 0] + 0.7152 * px[..., 1] + 0.0722 * px[..., 2]
    h, w = lum.shape
    ri = (np.arange(rows) * h) // rows
    ci = (np.arange(cols) * w) // cols
    return lum[np.ix_(ri, ci)]


def _bits_to_signed64(bits) -> int:
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def average_hash64(payload: bytes) -> int:
    """aHash: 8×8 luminance grid, bit = cell > grid mean. 64-bit SIGNED
    int (Spark ``long``); near-duplicate images differ in few bits, so
    hamming distance is the similarity metric. FLAT (zero-variance)
    grids have no mean contrast to encode — under the plain rule every
    flat image would hash to 0 and an all-black/all-white pair would
    "near-dup" merge destructively — so constant grids fall back to an
    absolute mid-gray threshold (black→0, white→all-ones: hamming 64
    apart; flats on the same side of mid-gray still merge, which IS
    near-duplicate behavior for two blank frames of similar tone).
    Only dependency-free BMP decode is wired; compressed codecs raise
    through ``decode_bmp``'s gate (plug a PIL-backed grid extractor
    where PIL exists)."""
    g = _luminance_grid(payload, 8, 8)
    m = g.mean()
    if (g == m).all():  # flat image: no contrast to hash
        return _bits_to_signed64((g > 127.5).ravel())
    return _bits_to_signed64((g > m).ravel())


def dhash64(payload: bytes) -> int:
    """dHash: 8×9 luminance grid, bit = cell brighter than its right
    neighbor (horizontal gradient sign). Same 64-bit signed contract as
    :func:`average_hash64`; gradients are robust to global
    brightness/contrast shifts that flip aHash bits wholesale."""
    g = _luminance_grid(payload, 8, 9)
    return _bits_to_signed64((g[:, :-1] > g[:, 1:]).ravel())


def media_hash_table(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    hasher: Callable[[bytes], int] = average_hash64,
) -> DataFrame:
    """(id, simhash) perceptual-hash relation over a media binary
    column (any hasher: image aHash/dHash, audio fingerprint) — Arrow-batched map, one Python call per batch, no shuffle.
    The output column is named ``simhash`` ON PURPOSE: it plugs
    directly into :func:`eligibility_etl_airflow_spark.operators.
    neardup.simhash_block_pairs`, so image near-dup reuses the text
    tier's banded pair generation (16-bit blocks, capped buckets,
    vectorized popcount verify) instead of growing a twin. Null
    payloads hash to null (dropped by the pair stage — an image that
    could not be read must never merge with anything)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [
                hasher(bytes(p)) if p is not None else None
                for p in pdf[binary_col]
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "simhash": pd.array(hashes, dtype="Int64")}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, binary_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, simhash long"
    )


def image_neardup_pairs(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    hasher: Callable[[bytes], int] = average_hash64,
    max_hamming: int = 3,
    max_bucket_size: int = 10000,
) -> DataFrame:
    """Image near-duplicate pairs: perceptual hash (aHash default) →
    banded candidate generation → exact hamming verify, entirely via
    the text tier's :func:`simhash_block_pairs` machinery. Recall is
    GUARANTEED for hamming ≤ 3 (pigeonhole over the 4 16-bit bands);
    raising ``max_hamming`` past 3 keeps precision (pairs are still
    verified) but candidates must share a 16-bit band, so recall
    becomes probabilistic — document the trade when tuning. At 100 TB
    the hash table is a narrow map over the image bytes; only the
    64-bit hashes shuffle (4 band rows each), never the payloads."""
    from eligibility_etl_airflow_spark.operators import neardup

    tab = media_hash_table(df, id_col, binary_col, hasher=hasher).filter(
        F.col("simhash").isNotNull()
    )
    return neardup.simhash_block_pairs(
        tab, id_col, max_hamming=max_hamming, max_bucket_size=max_bucket_size
    )


def audio_fingerprint64(payload: bytes) -> int:
    """64-bit spectral-envelope audio fingerprint: decode WAV → mono →
    power spectrum (rfft) → 65 equal bands → bit i = band i+1 louder
    than band i. Comparing ADJACENT band energies makes the fingerprint
    exactly invariant to gain (every band scales together — broadband
    clips re-encoded at a different gain hash bit-identically through
    real PCM16 round trips) while distinct content lands far apart
    (independent noise clips measure hamming ≥18). Caveat: for
    NARROWBAND signals (pure tones) most bands sit at the quantization
    floor, where the gradient ordering is fragile — this is a
    broadband-audio tool, like the production systems it simplifies.
    The simplified single-frame cousin of the Chromaprint/Shazam
    band-gradient family; same 64-bit signed contract as
    :func:`average_hash64`, so the banded pair machinery is shared."""
    import numpy as np

    _, _, frames = decode_wav(payload)
    mono = frames.mean(axis=1)
    if len(mono) == 0:
        return 0
    spec = np.abs(np.fft.rfft(mono)) ** 2
    starts = (np.arange(65) * len(spec)) // 65
    e = np.add.reduceat(spec, starts)
    return _bits_to_signed64(e[1:] > e[:-1])


def audio_neardup_pairs(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    max_hamming: int = 3,
    max_bucket_size: int = 10000,
) -> DataFrame:
    """Audio near-duplicate pairs: spectral fingerprint → the SAME
    banded candidate generation + vectorized hamming verify as text
    SimHash and image aHash (:func:`image_neardup_pairs`'s contract,
    including the hamming≤3 pigeonhole recall guarantee and the
    payloads-never-shuffle property)."""
    from eligibility_etl_airflow_spark.operators import neardup

    tab = media_hash_table(
        df, id_col, binary_col, hasher=audio_fingerprint64
    ).filter(F.col("simhash").isNotNull())
    return neardup.simhash_block_pairs(
        tab, id_col, max_hamming=max_hamming, max_bucket_size=max_bucket_size
    )


def payload_triage(df, bin_col: str):
    """Classify raw binary payloads (WARC bodies, scraped blobs) before
    the text pipeline touches them: ``is_text`` (valid UTF-8 AND no NUL
    byte — the classic binary-file tell), ``valid_utf8``,
    ``has_nul``, ``n_bytes``, and ``text`` — the decoded string for
    text payloads, with invalid sequences REPLACED (U+FFFD) via
    ``make_valid_utf8`` so a stray mojibake byte demotes a page to
    repairable rather than lost, NULL for binary payloads. All
    built-in JVM expressions (Spark 4's UTF-8 validation family) —
    map-only, codegen'd, composes into the ingest scan. Binary
    payloads route to the media tier (metadata/decode seams in this
    module); text payloads feed strip_html."""
    from pyspark.sql import functions as F

    b = F.col(bin_col)
    valid = F.is_valid_utf8(b)
    has_nul = F.contains(b, F.unhex(F.lit("00")))
    is_text = valid & ~has_nul
    return df.select(
        "*",
        valid.alias("valid_utf8"),
        has_nul.alias("has_nul"),
        is_text.alias("is_text"),
        F.length(b).cast("long").alias("n_bytes"),
        F.when(~has_nul, F.make_valid_utf8(b.cast("string"))).alias("text"),
    )
