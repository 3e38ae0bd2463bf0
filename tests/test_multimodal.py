"""Multimodal binary-column plumbing: the Spark-side contract (schema,
Arrow batch shape, partitioning pass-through, determinism) is real and
tested; only the media codec itself is stubbed (not installed here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bmspark import multimodal


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synth_media(spark, 300).persist()


def test_media_schema_and_determinism(spark, media):
    assert media.schema == multimodal.MEDIA_SCHEMA
    a = {r.media_id: (r.kind, r.n_bytes, bytes(r.payload)[:8]) for r in media.collect()}
    b = {
        r.media_id: (r.kind, r.n_bytes, bytes(r.payload)[:8])
        for r in multimodal.synth_media(spark, 300).collect()
    }
    assert a == b  # regenerating yields identical bytes (replay contract)


def test_image_features_shape(media):
    feats = multimodal.image_features(media)
    rows = feats.collect()
    assert len(rows) == 100  # every 3rd row is an image
    for r in rows:
        assert 64 <= r.width < 256 and 64 <= r.height < 256
        assert len(r.feature) == 8
        assert all(0.0 <= x <= 1.0 for x in r.feature)


def test_image_features_only_ship_needed_columns(media):
    """The Python hop must not carry untouched columns: the plan under
    mapInPandas projects only (media_id, payload)."""
    feats = multimodal.image_features(media)
    plan = feats._sc._jvm.PythonSQLUtils.explainString(
        feats._jdf.queryExecution(), "formatted"
    )
    assert "mime" not in plan.split("MapInPandas")[0]


def test_frame_sampling_counts(media):
    frames = multimodal.frame_sample(media, every_n=10)
    per_video = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("n_frames").alias("nf")
    )
    for r in per_video.collect():
        assert r.n == (r.nf + 9) // 10  # ceil(n_frames / every_n)
    assert frames.filter(F.col("frame_idx") % 10 != 0).count() == 0
