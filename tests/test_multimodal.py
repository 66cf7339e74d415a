"""Multimodal binary-column plumbing: schema, mapInPandas batching,
deterministic fake decode, real-decoder stub, frame-sample plan."""

import pytest
from pyspark.sql import functions as F

from airbyte_custom_spark.functions.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    synthetic_media,
)


def test_feature_extraction_shape_and_determinism(spark):
    media = synthetic_media(spark, n=48)
    out = extract_features(media, decoder="fake")
    rows = out.collect()
    assert len(rows) == 48
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= v < 1.0 for v in r["features"])
        assert r["n_bytes"] > 0
    again = {r["media_id"]: r["features"] for r in extract_features(media, "fake").collect()}
    assert all(again[r["media_id"]] == r["features"] for r in rows)


def test_identical_payload_identical_features(spark):
    media = synthetic_media(spark, n=8)
    dup = media.withColumn("media_id", F.col("media_id") + 100)
    feats = extract_features(media.unionByName(dup), "fake").collect()
    by_id = {r["media_id"]: tuple(r["features"]) for r in feats}
    for i in range(8):
        assert by_id[i] == by_id[i + 100]


def test_real_decoder_is_stubbed(spark):
    media = synthetic_media(spark, n=4)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_features(media, decoder="real").collect()


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=30)
    plan = frame_sample_plan(media, every_ms=500)
    vids = media.filter("kind = 'video'").select("media_id", "meta.duration_ms").collect()
    counts = {r["media_id"]: r["count"] for r in plan.groupBy("media_id").count().collect()}
    for v in vids:
        expected = (v["duration_ms"] - 1) // 500 + 1
        assert counts[v["media_id"]] == expected
    assert plan.filter("frame_ts_ms % 500 != 0").count() == 0
