"""Multimodal plumbing: binary schema, Arrow batching, stubbed codec."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def test_decode_stub_raises_without_fake():
    from data_pipeline_with_hdfs_sql_integration_spark.plans.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"abc")


def test_fake_decode_deterministic():
    from data_pipeline_with_hdfs_sql_integration_spark.plans.multimodal import decode_image

    assert decode_image(b"abc", fake=True) == [3.0, 97.0, 99.0, float((97 + 98 + 99) % 997)]
    assert decode_image(b"", fake=True) == [0.0, 0.0, 0.0, 0.0]


def test_feature_extraction_matches_driver_side(spark):
    from data_pipeline_with_hdfs_sql_integration_spark.plans.multimodal import extract_features, media_table

    media = media_table(spark, SF_DIR)
    feats = extract_features(media).orderBy("media_id").limit(5).collect()
    raw = media.orderBy("media_id").limit(5).collect()
    for f, r in zip(feats, raw):
        payload = bytes(r["payload"])
        assert f["media_id"] == r["media_id"]
        assert f["n_bytes"] == len(payload)
        assert f["checksum"] == sum(payload) % 1_000_000_007
        assert f["feat"][0] == float(len(payload))


def test_payload_binary_type(spark):
    from data_pipeline_with_hdfs_sql_integration_spark.plans.multimodal import media_table

    schema = dict(media_table(spark, SF_DIR).dtypes)
    assert schema["payload"] == "binary"
    assert schema["n_bytes"] == "bigint"


def test_resize_and_audio_stubs_gate_and_fake():
    import pytest

    from data_pipeline_with_hdfs_sql_integration_spark.plans.multimodal import (
        audio_frame_energy,
        resize_image,
    )

    with pytest.raises(NotImplementedError):
        resize_image(b"xy", 2, 2)
    with pytest.raises(NotImplementedError):
        audio_frame_energy(b"xy")
    thumb = resize_image(bytes(range(100)), 4, 4, fake=True)
    assert len(thumb) == 16 and thumb == resize_image(bytes(range(100)), 4, 4, fake=True)
    e = audio_frame_energy(bytes([10] * 300), frame_len=256, fake=True)
    assert e == [10.0, 10.0]
