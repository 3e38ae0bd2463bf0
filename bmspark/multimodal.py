"""Multimodal column plumbing — image/audio/video as opaque binary.

The Spark-side contract: binary payload column + typed metadata struct,
Arrow-batched mapInPandas decode/feature stages with bounded batch sizes
(big blobs → small batches), and partition-friendly pass-through of
untouched columns.

Decode status (honest, per format):
- **BMP images: REAL decode** — 24-bpp uncompressed BMP headers + pixel
  grids parsed with stdlib ``struct``/numpy; features are actual channel
  statistics. Round-trip-tested against generated ground truth.
- **WAV audio: REAL decode** — PCM16 parsed with stdlib ``wave``;
  features are actual duration/RMS/zero-crossing-rate.
- **Compressed formats (PNG/JPEG/MP3/MP4 …): stubbed** — codecs are not
  installed in this container; ``decode`` raises NotImplementedError for
  them. Swap in PIL/libav in deployment; nothing else changes — the
  schema, partitioning, UDF signature and batch shape are the real ones.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
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

AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("duration_sec", DoubleType()),
    StructField("rms", DoubleType()),
    StructField("zero_crossing_rate", DoubleType()),
])


# ---------------------------------------------------------------------------
# deterministic REAL payloads (stdlib encoders)
# ---------------------------------------------------------------------------

def make_bmp(seed: int) -> tuple[bytes, int, int]:
    """Minimal 24-bpp uncompressed BMP with a deterministic pixel pattern.
    Returns (payload, width, height) — the ground truth the decode tests
    round-trip against."""
    width = 8 + seed % 16
    height = 8 + seed % 8
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    img_size = (row_bytes + pad) * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += bytes([
                (seed * 7 + x * 3 + y) % 256,        # B
                (seed * 13 + x + y * 5) % 256,       # G
                (seed * 29 + x * 11 + y * 2) % 256,  # R
            ])
        rows.append(bytes(row) + b"\x00" * pad)
    return header + info + b"".join(rows), width, height


def make_wav(seed: int) -> tuple[bytes, int, int]:
    """PCM16 mono WAV with a deterministic pseudo-waveform. Returns
    (payload, sample_rate, n_samples)."""
    rate = 8000
    n = 400 + (seed * 37) % 400
    rnd = np.random.RandomState(seed)
    samples = (rnd.randn(n) * 3000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue(), rate, n


def synth_media(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic media table: REAL BMP images, REAL WAV audio, opaque
    fake video bytes (mp4 demux needs codecs this container lacks)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                if kind == "image":
                    payload, _w, _h = make_bmp(i)
                    mime = "image/bmp"
                elif kind == "audio":
                    payload, _r, _n = make_wav(i)
                    mime = "audio/wav"
                else:
                    payload = hashlib.sha256(f"media:{i}".encode()).digest() * (4 + i % 8)
                    mime = "video/mp4"
                rows.append({
                    "media_id": i, "kind": kind, "payload": payload,
                    "mime": mime, "n_bytes": len(payload),
                })
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# decoders
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL decode of 24-bpp uncompressed BMP: header via struct, pixel
    grid via numpy. Feature = [mean_B, mean_G, mean_R, std_B, std_G,
    std_R, width/256, height/256]."""
    if payload[:2] != b"BM":
        raise NotImplementedError(
            "image codec not installed for non-BMP payloads (PNG/JPEG need "
            "PIL/libjpeg; swap the decoder in deployment)"
        )
    offset = struct.unpack_from("<I", payload, 10)[0]
    _size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bpp uncompressed BMP (got bpp={bpp})")
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    rows = [
        np.frombuffer(payload, dtype=np.uint8,
                      count=row_bytes, offset=offset + y * stride)
        for y in range(abs(height))
    ]
    px = np.stack(rows).reshape(abs(height), width, 3).astype(np.float64)
    feat = [
        *(px[..., c].mean() / 255.0 for c in range(3)),
        *(px[..., c].std() / 255.0 for c in range(3)),
        width / 256.0,
        abs(height) / 256.0,
    ]
    return width, abs(height), [float(x) for x in feat]


def decode_wav(payload: bytes) -> tuple[int, int, float, float, float]:
    """REAL decode of PCM16 WAV via stdlib wave: (sample_rate, n_samples,
    duration_sec, rms, zero_crossing_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV decoded here")
        rate = w.getframerate()
        n = w.getnframes()
        samples = np.frombuffer(w.readframes(n), dtype=np.int16).astype(np.float64)
    rms = float(np.sqrt(np.mean(samples**2))) if n else 0.0
    zcr = float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1]))) if n > 1 else 0.0
    return rate, n, n / rate, rms, zcr


def image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature stage: mapInPandas so each task
    processes bounded batches of blobs; untouched columns are pruned out
    before the Python hop and rejoined by media_id if needed."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, feat = decode_bmp(bytes(payload))
                out.append({"media_id": int(mid), "width": w, "height": h, "feature": feat})
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL WAV feature extraction (duration/RMS/ZCR)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, n, dur, rms, zcr = decode_wav(bytes(payload))
                out.append({
                    "media_id": int(mid), "sample_rate": rate, "n_samples": n,
                    "duration_sec": dur, "rms": rms, "zero_crossing_rate": zcr,
                })
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
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
