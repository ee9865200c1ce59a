"""Multimodal plumbing tests: binary payload schema, Arrow-batched decode
stub, deterministic fake features, and the gated real-codec path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lexam_data_pipeline_spark.ml.multimodal import (
    FEATURE_SCHEMA,
    decode_stub,
    extract_features,
    media_table_from_documents,
)


def test_decode_stub_gated():
    with pytest.raises(NotImplementedError):
        decode_stub(b"abc", "image")


def test_decode_stub_deterministic():
    a = decode_stub(b"hello world", "image", deterministic_fake=True)
    b = decode_stub(b"hello world", "audio", deterministic_fake=True)
    assert a == b and len(a) == 8
    assert abs(sum(a) - 1.0) < 1e-9  # normalized histogram moments
    assert decode_stub(b"", "image", deterministic_fake=True) == [0.0] * 8


def test_media_table_schema_and_features(spark, sf_small):
    from lexam_data_pipeline_spark.catalog import load_table

    docs = load_table(spark, sf_small, "documents")
    media = media_table_from_documents(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    n = media.count()
    assert n == docs.count()

    feats = extract_features(media, deterministic_fake=True)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.limit(5).collect()
    assert all(len(r["feature"]) == 8 for r in rows)

    # Spark-side decode agrees with the driver-side stub on the same bytes
    one = media.orderBy("media_id").limit(1).collect()[0]
    got = (
        feats.filter(F.col("media_id") == one["media_id"]).collect()[0]["feature"]
    )
    expected = decode_stub(bytes(one["payload"]), one["media_type"], deterministic_fake=True)
    assert [pytest.approx(e, abs=1e-6) for e in expected] == list(got)


def test_extract_features_real_codec_path_raises(spark, sf_small):
    from lexam_data_pipeline_spark.catalog import load_table

    media = media_table_from_documents(load_table(spark, sf_small, "documents")).limit(2)
    feats = extract_features(media, deterministic_fake=False)
    with pytest.raises(Exception, match="codec"):
        feats.collect()


def test_resize_scales_payload(spark, sf_small):
    from lexam_data_pipeline_spark.catalog import load_table
    from lexam_data_pipeline_spark.ml.multimodal import resize_media

    media = media_table_from_documents(load_table(spark, sf_small, "documents")).limit(20)
    out = resize_media(media, 64, 48)
    rows = out.collect()
    assert all((r["width"], r["height"]) == (64, 48) for r in rows)
    # payload sizes scaled to the new pixel count
    src = {r["media_id"]: r for r in media.collect()}
    for r in rows:
        s = src[r["media_id"]]
        expected = max(1, int(s["n_bytes"] * (64 * 48) / (s["width"] * s["height"])))
        assert len(r["payload"]) == expected


def test_sample_frames_videos_only(spark, sf_small):
    from pyspark.sql import functions as F

    from lexam_data_pipeline_spark.catalog import load_table
    from lexam_data_pipeline_spark.ml.multimodal import sample_frames

    media = media_table_from_documents(load_table(spark, sf_small, "documents")).limit(30)
    n_videos = media.filter(F.col("media_type") == "video").count()
    frames = sample_frames(media, n_frames=4)
    rows = frames.collect()
    assert len(rows) == n_videos * 4
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_index"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in per.values())
