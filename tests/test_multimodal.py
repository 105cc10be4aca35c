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
