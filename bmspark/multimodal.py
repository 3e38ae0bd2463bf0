"""Multimodal column plumbing — image/audio/video as opaque binary.

The Spark-side contract is real and tested: binary payload column + typed
metadata struct, Arrow-batched mapInPandas decode/feature stages with
bounded batch sizes (big blobs → small batches), and partition-friendly
pass-through of untouched columns. The actual media decode is STUBBED —
image/audio codecs are not installed in this container — behind
``_decode_image_stub``, a deterministic fake that derives "pixels" from
the payload hash. Swap the stub for PIL/libav calls in a real deployment;
nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
    StructField("n_bytes", LongType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("feature", ArrayType(FloatType())),
])


def synth_media(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                payload = hashlib.sha256(f"media:{i}".encode()).digest() * (4 + int(i) % 8)
                kind = ["image", "audio", "video"][int(i) % 3]
                rows.append({
                    "media_id": int(i),
                    "kind": kind,
                    "payload": payload,
                    "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    "n_bytes": len(payload),
                })
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: dims + 8-dim 'feature' from payload hash.
    REPLACE with real decode (PIL.Image.open etc.) in deployment:
        raise NotImplementedError("image codec not installed")
    is the honest form; the fake keeps the plumbing testable here."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feature = [b / 255.0 for b in h[2:10]]
    return width, height, feature


def image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature stage: mapInPandas so each task
    processes bounded batches of blobs; untouched columns are pruned out
    before the Python hop and rejoined by media_id if needed."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, feat = _decode_image_stub(bytes(payload))
                out.append({"media_id": int(mid), "width": w, "height": h, "feature": feat})
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explodes a deterministic frame index
    list per video (real impl would demux with libav); shows the
    row-expansion shape (one row per sampled frame) with JVM explode."""
    vids = media.filter(F.col("kind") == "video").withColumn(
        "n_frames", (F.col("n_bytes") % 300 + 30).cast("int")
    )
    return vids.select(
        "media_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
