"""Multimodal plumbing: schema contract, Arrow batch shape, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as Fn

from ksql_spark.operators.multimodal import (
    FEATURE_DIM,
    FEATURES_SCHEMA,
    extract_features,
    resize_images,
    sample_video_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=48, seed=42)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "width", "height", "duration_ms",
    ]
    assert dict(media.dtypes)["payload"] == "binary"


def test_extract_features_contract(media):
    feats = extract_features(media, decode_stub=True)
    assert feats.schema == FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == 48
    assert all(len(r.features) == FEATURE_DIM for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r.features)


def test_features_deterministic(spark):
    a = extract_features(synthesize_media(spark, 16), decode_stub=True)
    b = extract_features(synthesize_media(spark, 16), decode_stub=True)
    assert sorted(map(repr, a.collect())) == sorted(map(repr, b.collect()))


def test_real_decode_rejects_non_media_payloads(media):
    """decode_stub=False is a REAL decoder now (operators/codecs.py): fed
    the stub fixture's plain-text payloads it must fail loudly, not emit
    garbage features."""
    with pytest.raises(Exception, match="not a PNG|not an RVID|RIFF|Error"):
        extract_features(media, decode_stub=False).collect()


def test_resize_dims_jvm_side(media):
    out = resize_images(media, max_side=100, decode_stub=True)
    rows = out.select("width", "height", "target_width", "target_height").collect()
    for r in rows:
        assert max(r.target_width, r.target_height) <= 100 or max(r.width, r.height) <= 100
        assert r.target_width >= 1 and r.target_height >= 1


def test_frame_sampling(media):
    frames = sample_video_frames(media, every_ms=500)
    j = frames.join(media, "media_id").select("frame_ts_ms", "duration_ms").collect()
    assert all(0 <= r.frame_ts_ms < r.duration_ms + 500 for r in j)
    assert frames.count() > 0
