"""Multimodal plumbing tests: schema, determinism, batch shape, and
frame-sampling arithmetic over the stubbed decoder (the decode itself
is a documented stub -- the Spark-side contract is what's under test)."""

from __future__ import annotations

import pytest

from data_wrangling_osm_xml_with_python_into_mongodb_spark.functions.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    _decode_stub,
    extract_features,
    resize_meta,
    sample_frames,
    synth_media,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(40)
    return synth_media(docs, kind="video").cache()


def test_media_schema_and_payload(media):
    row = media.first()
    assert isinstance(row["data"], (bytes, bytearray)) and len(row["data"]) == 128
    assert row["meta"]["format"] == "fake"
    assert media.count() == 40


def test_extract_features_deterministic(media):
    out = extract_features(media)
    assert out.schema == FEATURE_SCHEMA
    rows1 = {r["media_id"]: r["feature"] for r in out.collect()}
    rows2 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert rows1 == rows2
    assert all(len(v) == 8 for v in rows1.values())
    assert all(0.0 <= x <= 1.0 for v in rows1.values() for x in v)


def test_resize_meta(media):
    resized = resize_meta(media, 224, 224)
    r = resized.first()
    assert (r["meta"]["width"], r["meta"]["height"]) == (224, 224)
    # payload untouched
    assert len(r["data"]) == 128


def test_sample_frames(media):
    frames = sample_frames(media, every_k=2)
    assert frames.schema == FRAME_SCHEMA
    got = frames.groupBy("media_id").count().collect()
    metas = {r["media_id"]: r["meta"]["n_frames"] for r in media.collect()}
    for r in got:
        n = metas[r["media_id"]]
        assert r["count"] == (n + 1) // 2
    # frame features vary by index (salted decode)
    two = (
        frames.filter(frames.media_id == got[0]["media_id"])
        .orderBy("frame_idx")
        .collect()
    )
    if len(two) >= 2:
        assert two[0]["frame_feature"] != two[1]["frame_feature"]


def test_codec_stub_raises():
    with pytest.raises(NotImplementedError):
        _decode_stub(b"x", require_codec=True)
