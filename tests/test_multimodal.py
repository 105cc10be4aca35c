"""Multimodal binary-column plumbing: metadata without decode, the
decoder/resizer seams, and the frame-sample explode shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import multimodal


def _payloads(spark):
    rows = [
        (1, bytes.fromhex("FFD8FF") + b"jpegdata" * 10),
        (2, bytes.fromhex("89504E47") + b"pngdata" * 10),
        (3, bytes.fromhex("494433") + b"mp3data" * 10),
        (4, b"plain text payload"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_sniff_format_and_metadata(spark):
    df = _payloads(spark).withColumn("meta", multimodal.binary_metadata(F.col("payload")))
    got = {r.doc_id: r.meta for r in df.collect()}
    assert got[1].format == "jpeg"
    assert got[2].format == "png"
    assert got[3].format == "mp3"
    assert got[4].format == "unknown"
    assert got[1].n_bytes == 3 + 80
    assert got[5] is None or got[5].n_bytes is None


def test_sniff_format_py_parity(spark):
    """sniff_format_py (the fused-Python-stage twin) must agree with the
    sniff_format column expression byte for byte — the r10 fused
    multimodal_features query computes format Python-side."""
    import hashlib

    from eligibility_etl_airflow_spark.operators.multimodal import (
        encode_bmp_rgb24,
        encode_wav_pcm16,
        sniff_format_py,
    )
    import numpy as np

    payloads = [
        bytes.fromhex("FFD8FF") + b"jpegdata" * 10,
        bytes.fromhex("89504E47") + b"pngdata" * 10,
        bytes.fromhex("47494638") + b"gifdata" * 10,
        bytes.fromhex("494433") + b"mp3data" * 10,
        b"plain text payload",
        b"B",  # shorter than any magic
        b"",
        encode_wav_pcm16(np.zeros(16), 8000),
        encode_bmp_rgb24(np.zeros((2, 2, 3), dtype=np.uint8)),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i long, payload binary"
    ).withColumn("meta", multimodal.binary_metadata(F.col("payload")))
    jvm = {r.i: (r.meta.format, r.meta.content_md5, r.meta.n_bytes) for r in df.collect()}
    for i, p in enumerate(payloads):
        assert jvm[i][0] == sniff_format_py(p)
        assert jvm[i][1] == hashlib.md5(p).hexdigest()
        assert jvm[i][2] == len(p)


def test_decode_features_shape_and_determinism(spark):
    df = _payloads(spark)
    feats = {r.doc_id: r.features for r in multimodal.decode_features(df, "payload", "doc_id").collect()}
    assert len(feats[1]) == 9
    assert feats[5] is None
    # deterministic: same payload → same features
    again = {r.doc_id: r.features for r in multimodal.decode_features(df, "payload", "doc_id").collect()}
    assert feats == again


def test_resize_then_decode_composes(spark):
    df = _payloads(spark).filter(F.col("payload").isNotNull())
    resized = multimodal.resize_images(df, "payload", "doc_id", width=8, height=4)
    rows = {r.doc_id: r.resized for r in resized.collect()}
    assert all(len(v) == 32 for v in rows.values())
    feats = multimodal.decode_features(
        resized.withColumnRenamed("resized", "payload"), "payload", "doc_id"
    )
    assert feats.count() == 4


def test_frame_sample_plan_offsets(spark):
    df = _payloads(spark).filter(F.col("doc_id") == 1)
    frames = multimodal.frame_sample_plan(df, "payload", every_n_bytes=16)
    offs = sorted(r.frame_offset for r in frames.collect())
    # payload is 83 bytes → offsets 0,16,...,80
    assert offs == [0, 16, 32, 48, 64, 80]


def test_real_decoder_raises_cleanly():
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.real_image_decoder(b"payload")


def test_wav_roundtrip_recovers_signal():
    import numpy as np

    from eligibility_etl_airflow_spark.operators import multimodal as mm

    t = np.arange(8000) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    payload = mm.encode_wav_pcm16(sig, 8000)
    rate, nch, frames = mm.decode_wav(payload)
    assert (rate, nch) == (8000, 1)
    assert frames.shape == (8000, 1)
    # PCM16 quantization: recovered samples within 1 LSB
    assert np.abs(frames[:, 0] - sig).max() < 1.5 / 32767


def test_wav_audio_features_physics():
    import numpy as np

    from eligibility_etl_airflow_spark.operators import multimodal as mm

    t = np.arange(8000) / 8000.0
    payload = mm.encode_wav_pcm16(0.5 * np.sin(2 * np.pi * 440.0 * t), 8000)
    kind, n, rate, nch, dur, rms, zcr, peak, dc = mm.audio_features(payload)
    assert kind == 1.0 and n == 8000 and rate == 8000 and nch == 1
    assert dur == 1.0
    # sine RMS = A/sqrt(2); zero crossings = 2 per cycle -> 880/8000
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(zcr - 880 / 8000) < 0.005
    assert abs(peak - 0.5) < 1e-3
    assert abs(dc) < 1e-3


def test_bmp_roundtrip_exact():
    import numpy as np

    from eligibility_etl_airflow_spark.operators import multimodal as mm

    rng = np.random.default_rng(0)
    # width 3 forces a nonzero row pad (9 bytes -> stride 12)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    decoded = mm.decode_bmp(mm.encode_bmp_rgb24(px))
    assert (decoded == px).all()
    feats = mm.bmp_features(mm.encode_bmp_rgb24(px))
    assert feats[0] == 2.0 and feats[1] == 3.0 and feats[2] == 5.0
    assert feats[4] == round(float(px[..., 0].mean()), 6)


def test_real_media_decoder_in_spark_pipeline(spark):
    import numpy as np

    from eligibility_etl_airflow_spark.operators import multimodal as mm

    t = np.arange(800) / 8000.0
    rows = [
        (1, mm.encode_wav_pcm16(0.5 * np.sin(2 * np.pi * 400 * t), 8000)),
        (2, mm.encode_bmp_rgb24(np.full((4, 4, 3), [10, 20, 30], dtype=np.uint8))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = {
        r.doc_id: r.features
        for r in mm.decode_features(
            df, "payload", "doc_id", decoder=mm.real_media_decoder
        ).collect()
    }
    assert feats[1][0] == 1.0 and feats[1][2] == 8000.0  # audio: rate decoded
    assert feats[2][0] == 2.0 and feats[2][4:7] == [10.0, 20.0, 30.0]  # image: RGB means
    # magic sniff tags both containers
    from pyspark.sql import functions as F

    tags = {
        r.doc_id: r.fmt
        for r in df.select("doc_id", mm.sniff_format(F.col("payload")).alias("fmt")).collect()
    }
    assert tags == {1: "riff", 2: "bmp"}


def test_decoder_gates_stay_honest():
    import pytest as _pytest

    from eligibility_etl_airflow_spark.operators import multimodal as mm

    # compressed codec still raises through the import gate
    with _pytest.raises((NotImplementedError, ValueError)):
        mm.real_media_decoder(b"\xff\xd8\xff\xe0fakejpeg")
    # malformed BMP depth rejected, not guessed
    import numpy as np
    import struct

    bad = bytearray(mm.encode_bmp_rgb24(np.zeros((1, 1, 3), dtype=np.uint8)))
    struct.pack_into("<H", bad, 28, 8)  # claim 8bpp
    with _pytest.raises(NotImplementedError):
        mm.decode_bmp(bytes(bad))


def test_resize_nearest_exact_indices():
    import numpy as np

    import pytest

    from eligibility_etl_airflow_spark.operators import multimodal as mm

    # 4x4 gradient -> 2x2 picks rows/cols {0,2}
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    small = mm.resize_nearest(px, 2, 2)
    assert small.shape == (2, 2, 3)
    assert (small == px[[0, 2]][:, [0, 2]]).all()
    # identity at same size; upscale repeats source pixels
    assert (mm.resize_nearest(px, 4, 4) == px).all()
    up = mm.resize_nearest(px, 8, 8)
    assert (up[0] == up[1]).all() and (up[0, 0] == px[0, 0]).all()
    with pytest.raises(ValueError):
        mm.resize_nearest(px, 0, 2)


def test_bmp_resize_roundtrip_in_spark(spark):
    import numpy as np

    from eligibility_etl_airflow_spark.operators import multimodal as mm

    px = np.arange(6 * 6 * 3, dtype=np.uint8).reshape(6, 6, 3)
    payload = mm.encode_bmp_rgb24(px)
    df = spark.createDataFrame([(1, bytearray(payload)), (2, None)], "id long, img binary")
    out = {
        r.id: r.resized
        for r in mm.resize_images(df, "img", "id", 3, 3, resizer=mm.bmp_resizer).collect()
    }
    assert out[2] is None
    got = mm.decode_bmp(bytes(out[1]))
    assert (got == px[[0, 2, 4]][:, [0, 2, 4]]).all()


# ------------------------------------------------- perceptual image hashing


def _grid_bmp(cells):
    """8x8 grid of grayscale cell values -> 8x8 BMP (1 px per cell)."""
    import numpy as np

    g = np.asarray(cells, dtype=np.uint8)
    return multimodal.encode_bmp_rgb24(np.repeat(g[:, :, None], 3, axis=2))


def _checkerboard(flip=()):
    import numpy as np

    g = np.fromfunction(lambda r, c: ((r + c) % 2) * 200, (8, 8)).astype(np.uint8)
    for r, c in flip:
        g[r, c] = 200 - g[r, c]
    return g


def test_ahash_scale_invariant_under_nearest_upscale():
    import numpy as np

    g = _checkerboard()
    small = multimodal.encode_bmp_rgb24(np.repeat(g[:, :, None], 3, axis=2))
    big = multimodal.encode_bmp_rgb24(
        np.repeat(np.kron(g, np.ones((2, 2), dtype=np.uint8))[:, :, None], 3, axis=2)
    )
    assert multimodal.average_hash64(small) == multimodal.average_hash64(big)


def test_ahash_hamming_tracks_planted_cell_flips():
    a = multimodal.average_hash64(_grid_bmp(_checkerboard()))
    a2 = multimodal.average_hash64(_grid_bmp(_checkerboard(flip=[(0, 0), (3, 4)])))
    inv = multimodal.average_hash64(_grid_bmp(200 - _checkerboard()))
    ham = bin((a ^ a2) & ((1 << 64) - 1)).count("1")
    assert ham == 2
    assert bin((a ^ inv) & ((1 << 64) - 1)).count("1") == 64


def test_dhash_invariant_to_global_brightness_shift():
    import numpy as np

    g = _checkerboard().astype(np.int32)
    shifted = np.clip(g + 40, 0, 255).astype(np.uint8)
    d1 = multimodal.dhash64(_grid_bmp(g.astype(np.uint8)))
    d2 = multimodal.dhash64(_grid_bmp(shifted))
    assert d1 == d2


def test_image_neardup_pairs_planted(spark):
    # A and its 2-bit-flip twin pair up (hamming 2 <= 3); the inverted
    # board (hamming 64) never pairs with either
    payloads = [
        (1, _grid_bmp(_checkerboard())),
        (2, _grid_bmp(_checkerboard(flip=[(0, 0), (3, 4)]))),
        (3, _grid_bmp(200 - _checkerboard())),
        (4, None),  # unreadable image must never merge with anything
    ]
    df = spark.createDataFrame(payloads, "img_id long, payload binary")
    pairs = multimodal.image_neardup_pairs(df, "img_id", "payload").collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [(1, 2, 2)]


# ------------------------------------------------- audio fingerprinting


def _noise_wav(seed, gain=0.5, n=800, rate=8000):
    import numpy as np

    rng = np.random.RandomState(seed)
    base = rng.randn(n)
    return multimodal.encode_wav_pcm16(gain * base / np.abs(base).max(), rate)


def test_audio_fingerprint_gain_invariant_and_discriminative():
    # broadband content: gain re-encode is bit-identical; independent
    # clips are far apart (the operator docstring's measured contract)
    quiet = multimodal.audio_fingerprint64(_noise_wav(7, gain=0.2))
    loud = multimodal.audio_fingerprint64(_noise_wav(7, gain=0.9))
    other = multimodal.audio_fingerprint64(_noise_wav(8, gain=0.5))
    mask = (1 << 64) - 1
    assert quiet == loud  # same recording, new gain
    assert bin((quiet ^ other) & mask).count("1") > 10  # different content


def test_audio_neardup_pairs_planted(spark):
    rows = [
        (1, _noise_wav(7, gain=0.2)),
        (2, _noise_wav(7, gain=0.9)),  # near-dup of 1 (gain change)
        (3, _noise_wav(8)),  # different content — never pairs
        (4, None),
    ]
    df = spark.createDataFrame(rows, "clip_id long, payload binary")
    pairs = multimodal.audio_neardup_pairs(df, "clip_id", "payload").collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["hamming"] <= 3


def test_flat_images_do_not_cross_merge():
    import numpy as np

    # all-black vs all-white: zero-variance grids fall back to the
    # absolute mid-gray threshold, landing hamming 64 apart — a blank
    # black frame must never "near-dup" a blank white one
    black = multimodal.encode_bmp_rgb24(np.zeros((8, 8, 3), dtype=np.uint8))
    white = multimodal.encode_bmp_rgb24(np.full((8, 8, 3), 255, dtype=np.uint8))
    hb = multimodal.average_hash64(black)
    hw = multimodal.average_hash64(white)
    assert bin((hb ^ hw) & ((1 << 64) - 1)).count("1") == 64
    # two blank frames of the same tone still merge (that IS a near-dup)
    white2 = multimodal.encode_bmp_rgb24(np.full((8, 8, 3), 250, dtype=np.uint8))
    assert multimodal.average_hash64(white2) == hw


def test_payload_triage_three_way(spark):
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [("clean text", 0), ("mojibake", 1), ("binary", 2)], "t string, k int"
    )
    b = df.select(
        "k",
        F.when(F.col("k") == 1, F.concat(F.encode("t", "UTF-8"), F.unhex(F.lit("FF"))))
        .when(F.col("k") == 2, F.concat(F.unhex(F.lit("00")), F.encode("t", "UTF-8")))
        .otherwise(F.encode("t", "UTF-8"))
        .alias("payload"),
    )
    got = {r["k"]: r for r in M.payload_triage(b, "payload").collect()}
    assert (got[0]["valid_utf8"], got[0]["has_nul"], got[0]["is_text"]) == (
        True, False, True,
    )
    assert got[0]["text"] == "clean text" and got[0]["n_bytes"] == 10
    # invalid byte: demoted but REPAIRED, not lost
    assert got[1]["is_text"] is False and got[1]["text"] == "mojibake�"
    # NUL byte: binary — no text route
    assert got[2]["has_nul"] is True and got[2]["text"] is None
