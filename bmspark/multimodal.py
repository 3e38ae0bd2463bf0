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
- **AVI video: REAL container demux** — RIFF chunk walk with stdlib
  ``struct``: ``avih`` header (dwTotalFrames, dwWidth, dwHeight,
  dwMicroSecPerFrame) and raw ``00db`` frame chunks in the ``movi``
  list. Frame sampling indexes come from the container, and sampled
  frame bytes are the actual chunk payloads. Compressed codecs inside
  the container are NOT decoded (no libav here) — but uncompressed DIB
  frames round-trip.
- **PNG images: REAL decode** — PNG is deflate (stdlib ``zlib``) plus
  per-scanline byte filters, so it is decodable honestly with no
  external codec: chunk walk + IHDR parse + IDAT inflate + full
  None/Sub/Up/Average/Paeth unfiltering for 8-bit RGB/RGBA. The
  encoder (``make_png``) cycles all five filter types across scanlines
  so round-trip tests exercise every unfilter path. Palette/16-bit/
  interlaced PNGs raise NotImplementedError (deployment: PIL).
- **Compressed formats (JPEG/MP3/MP4 …): stubbed** — codecs are not
  installed in this container; ``decode`` raises NotImplementedError for
  them. Swap in PIL/libav in deployment; nothing else changes — the
  schema, partitioning, UDF signature and batch shape are the real ones.
"""

from __future__ import annotations

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    # PNG spec §9.4 Paeth predictor (public W3C spec)
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def make_png(seed: int) -> tuple[bytes, int, int]:
    """Minimal REAL 8-bit RGB PNG with a deterministic pixel pattern.
    Scanline filters CYCLE through all five types (y % 5) so the decoder
    round-trip exercises every unfilter path, not just filter 0.
    Returns (payload, width, height)."""
    import zlib

    width = 8 + seed % 16
    height = 8 + seed % 8
    bpp = 3
    raw_rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += bytes([
                (seed * 29 + x * 11 + y * 2) % 256,  # R
                (seed * 13 + x + y * 5) % 256,       # G
                (seed * 7 + x * 3 + y) % 256,        # B
            ])
        raw_rows.append(bytes(row))

    filtered = bytearray()
    prior = bytes(width * bpp)
    for y, raw in enumerate(raw_rows):
        ft = y % 5
        filtered.append(ft)
        for x in range(width * bpp):
            left = raw[x - bpp] if x >= bpp else 0
            up = prior[x]
            ul = prior[x - bpp] if x >= bpp else 0
            if ft == 0:
                v = raw[x]
            elif ft == 1:
                v = raw[x] - left
            elif ft == 2:
                v = raw[x] - up
            elif ft == 3:
                v = raw[x] - ((left + up) >> 1)
            else:
                v = raw[x] - _paeth(left, up, ul)
            filtered.append(v & 0xFF)
        prior = raw

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
        + _png_chunk(b"IEND", b"")
    )
    return payload, width, height


def _png_pixels(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Shared PNG pixel-grid decode: chunk walk, IDAT concatenation,
    zlib inflate, full None/Sub/Up/Average/Paeth unfiltering (W3C PNG
    spec §9). Returns (width, height, (H, W, bpp) uint8 array)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None:
        raise NotImplementedError("PNG missing IHDR")
    width, height, depth, ctype_n, _comp, _filt, interlace = ihdr
    if depth != 8 or ctype_n not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit RGB/RGBA non-interlaced PNG decoded here (depth="
            f"{depth} colortype={ctype_n} interlace={interlace}); palette/"
            "16-bit/interlaced need PIL in deployment"
        )
    bpp = 3 if ctype_n == 2 else 4
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise NotImplementedError("truncated PNG pixel data")

    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 0:
            pass
        elif ft == 2:  # Up — vectorizable, no intra-row dependency
            line = bytearray(
                (np.frombuffer(bytes(line), np.uint8) + prior).astype(np.uint8).tobytes()
            )
        else:  # Sub/Average/Paeth depend on the just-decoded left byte
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                up = int(prior[x])
                ul = int(prior[x - bpp]) if x >= bpp else 0
                if ft == 1:
                    line[x] = (line[x] + left) & 0xFF
                elif ft == 3:
                    line[x] = (line[x] + ((left + up) >> 1)) & 0xFF
                elif ft == 4:
                    line[x] = (line[x] + _paeth(left, up, ul)) & 0xFF
                else:
                    raise NotImplementedError(f"unknown PNG filter {ft}")
        prior = np.frombuffer(bytes(line), np.uint8)
        out[y] = prior
    return width, height, out.reshape(height, width, bpp)


def decode_png(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL decode of 8-bit RGB/RGBA non-interlaced PNG with pure
    stdlib (see _png_pixels). Feature vector matches decode_bmp's
    layout: [mean_B, mean_G, mean_R, std_B, std_G, std_R, width/256,
    height/256]."""
    width, height, grid = _png_pixels(payload)
    px = grid[..., :3].astype(np.float64)
    # feature layout identical to decode_bmp (B,G,R order there)
    feat = [
        px[..., 2].mean() / 255.0, px[..., 1].mean() / 255.0,
        px[..., 0].mean() / 255.0,
        px[..., 2].std() / 255.0, px[..., 1].std() / 255.0,
        px[..., 0].std() / 255.0,
        width / 256.0, height / 256.0,
    ]
    return width, height, [float(x) for x in feat]


def decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Magic-byte dispatch over the image decoders: BMP and PNG are real
    stdlib decodes; JPEG (and anything else) raises the honest
    codec-absence guard."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "image codec not installed for this format (JPEG needs libjpeg/"
        "PIL; swap the decoder in deployment)"
    )


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


def make_avi(seed: int) -> tuple[bytes, int, int, int, int]:
    """Minimal REAL AVI/RIFF container: ``hdrl`` list with a spec-shaped
    ``avih`` main header + ``strl``/``strh`` video stream header, and a
    ``movi`` list of uncompressed ``00db`` DIB frame chunks with a
    deterministic pixel pattern. Returns (payload, n_frames, width,
    height, us_per_frame) — the ground truth frame_sample round-trips
    against. Layout per the public AVI RIFF spec (msdn AVIMAINHEADER /
    AVISTREAMHEADER)."""
    n_frames = 30 + seed % 60
    width = 8 + seed % 8
    height = 6 + seed % 6
    us_per_frame = 40000  # 25 fps
    frame_size = width * height * 3

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack(
        "<14I",
        us_per_frame,            # dwMicroSecPerFrame
        frame_size * 25,         # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags (AVIF_HASINDEX clear, interleaved)
        n_frames,                # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        frame_size,              # dwSuggestedBufferSize
        width, height,           # dwWidth, dwHeight
        0, 0, 0, 0,              # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, 25,                   # dwScale, dwRate → 25 fps
        0, n_frames,             # dwStart, dwLength (frames)
        frame_size, 0xFFFFFFFF, 0,
        0, 0, width, height,     # rcFrame
    )
    strf = struct.pack(          # BITMAPINFOHEADER, bottom-up 24bpp
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    frames = []
    for f in range(n_frames):
        px = bytes(
            (seed * 31 + f * 7 + i) % 256 for i in range(frame_size)
        )
        frames.append(chunk(b"00db", px))
    movi = lst(b"movi", b"".join(frames))
    riff_body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    return payload, n_frames, width, height, us_per_frame


def _riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_len) walking sibling RIFF chunks."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)  # chunks are word-aligned


def parse_avi(payload: bytes) -> dict:
    """REAL AVI header demux: walk RIFF → LIST/hdrl → avih with stdlib
    struct. Returns {n_frames, width, height, us_per_frame,
    frame_offsets} where frame_offsets are the (offset, length) of each
    ``00db``/``00dc`` chunk body in the ``movi`` list — everything read
    from the container, nothing inferred from payload length."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError(
            "video demux implemented for AVI/RIFF containers only "
            "(MP4/MKV demux needs libav; swap the demuxer in deployment)"
        )
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    out: dict = {"frame_offsets": []}
    for fourcc, body, size in _riff_chunks(payload, 12, 8 + riff_size):
        if fourcc != b"LIST":
            continue
        kind = payload[body:body + 4]
        if kind == b"hdrl":
            for cc2, b2, s2 in _riff_chunks(payload, body + 4, body + size):
                if cc2 == b"avih":
                    fields = struct.unpack_from("<14I", payload, b2)
                    out["us_per_frame"] = fields[0]
                    out["n_frames"] = fields[4]
                    out["width"] = fields[8]
                    out["height"] = fields[9]
        elif kind == b"movi":
            for cc2, b2, s2 in _riff_chunks(payload, body + 4, body + size):
                if cc2 in (b"00db", b"00dc"):
                    out["frame_offsets"].append((b2, s2))
    if "n_frames" not in out:
        raise ValueError("AVI container missing avih header")
    return out


def extract_frame(payload: bytes, frame_idx: int, meta: dict | None = None) -> bytes:
    """Raw bytes of frame ``frame_idx`` straight from its movi chunk.
    Pass a pre-parsed ``meta`` (from parse_avi) when sampling multiple
    frames from one container — otherwise every call re-walks the whole
    RIFF tree, turning f samples into O(f × container_size)."""
    if meta is None:
        meta = parse_avi(payload)
    off, size = meta["frame_offsets"][frame_idx]
    return payload[off:off + size]


def extract_frames(payload: bytes, frame_indices, meta: dict | None = None) -> list[bytes]:
    """All requested frames from ONE container parse."""
    if meta is None:
        meta = parse_avi(payload)
    return [extract_frame(payload, i, meta) for i in frame_indices]


def synth_media(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic media table: REAL BMP images, REAL WAV audio, REAL
    AVI/RIFF video containers (uncompressed DIB frames)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                if kind == "image":
                    # alternate codecs so both real decode paths are
                    # exercised corpus-wide (BMP and PNG)
                    if (i // 3) % 2 == 0:
                        payload, _w, _h = make_bmp(i)
                        mime = "image/bmp"
                    else:
                        payload, _w, _h = make_png(i)
                        mime = "image/png"
                elif kind == "audio":
                    payload, _r, _n = make_wav(i)
                    mime = "audio/wav"
                else:
                    payload, _nf, _w, _h, _us = make_avi(i)
                    mime = "video/x-msvideo"
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


def decode_image_pixels(payload: bytes) -> np.ndarray:
    """REAL pixel-grid decode for the resize/thumbnail path: returns an
    (H, W, 3) uint8 array in the container's stored row order (BMP
    stores bottom-up, PNG top-down — thumbnailing re-encodes in the
    same order, so round-trips are self-consistent). Channel order is
    the container's own (BMP: BGR, PNG: RGB) — resampling is
    channel-agnostic. Unsupported formats raise the codec guard."""
    if payload[:8] == _PNG_SIG:
        _w, _h, grid = _png_pixels(payload)
        return grid[..., :3].copy()
    if payload[:2] == b"BM":
        offset = struct.unpack_from("<I", payload, 10)[0]
        _size, width, height, _planes, bpp, compression = struct.unpack_from(
            "<IiiHHI", payload, 14
        )
        if bpp != 24 or compression != 0:
            raise NotImplementedError(
                f"only 24-bpp uncompressed BMP (got bpp={bpp})"
            )
        row_bytes = width * 3
        stride = row_bytes + (4 - row_bytes % 4) % 4
        rows = [
            np.frombuffer(payload, dtype=np.uint8,
                          count=row_bytes, offset=offset + y * stride)
            for y in range(abs(height))
        ]
        return np.stack(rows).reshape(abs(height), width, 3).copy()
    raise NotImplementedError(
        "image codec not installed for this format (JPEG needs libjpeg/"
        "PIL; swap the decoder in deployment)"
    )


def resize_nearest(px: np.ndarray, max_dim: int) -> np.ndarray:
    """Nearest-neighbor downsample preserving aspect ratio: the longest
    side becomes ``max_dim`` (never upsamples). Pure numpy fancy
    indexing — the standard decode→resize prep stage of an image
    training pipeline, exact and deterministic (no interpolation
    kernel to disagree about across platforms)."""
    h, w = px.shape[:2]
    scale = max(h, w) / max_dim
    if scale <= 1:
        return px
    nh, nw = max(1, round(h / scale)), max(1, round(w / scale))
    ys = np.minimum((np.arange(nh) * (h / nh)).astype(int), h - 1)
    xs = np.minimum((np.arange(nw) * (w / nw)).astype(int), w - 1)
    return px[np.ix_(ys, xs)]


def encode_bmp(px: np.ndarray) -> bytes:
    """Re-encode an (H, W, 3) uint8 grid as a 24-bpp uncompressed BMP —
    the thumbnail output container (always decodable downstream with
    decode_bmp, regardless of the source format)."""
    h, w = px.shape[:2]
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    img_size = (row_bytes + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    body = b"".join(
        px[y].astype(np.uint8).tobytes() + b"\x00" * pad for y in range(h)
    )
    return header + info + body


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
                w, h, feat = decode_image(bytes(payload))
                out.append({"media_id": int(mid), "width": w, "height": h, "feature": feat})
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


THUMBNAIL_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("thumb_width", IntegerType()),
    StructField("thumb_height", IntegerType()),
    StructField("thumb", BinaryType()),
])


def image_thumbnails(media: DataFrame, max_dim: int = 8) -> DataFrame:
    """The resize stage of an image training pipeline: REAL decode
    (BMP/PNG) → aspect-preserving nearest-neighbor downsample to
    ``max_dim`` on the longest side → re-encode as 24-bpp BMP (always
    decodable downstream regardless of source format). Arrow-batched
    mapInPandas with only (media_id, payload) shipped to Python;
    output thumbnails are ~max_dim² × 3 bytes — the shuffle-friendly
    shape for a downstream vision-embedding stage. Never upsamples."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image_pixels(bytes(payload))
                small = resize_nearest(px, max_dim)
                out.append({
                    "media_id": int(mid),
                    "width": px.shape[1], "height": px.shape[0],
                    "thumb_width": small.shape[1],
                    "thumb_height": small.shape[0],
                    "thumb": encode_bmp(small),
                })
            yield pd.DataFrame(
                out, columns=[f.name for f in THUMBNAIL_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=THUMBNAIL_SCHEMA)
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


AUDIO_FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("start_sec", DoubleType()),
    StructField("rms", DoubleType()),
    StructField("zero_crossing_rate", DoubleType()),
])


def audio_frame_features(media: DataFrame, window_ms: int = 100) -> DataFrame:
    """Frame-level audio features — the audio twin of frame_features:
    the PCM16 stream is cut into ``window_ms`` windows and each yields
    (rms, zero_crossing_rate), the classic energy/voicing contour a
    model consumes instead of one whole-clip statistic. REAL stdlib
    decode (wave) + one numpy reshape per clip; Arrow-batched
    mapInPandas, trailing partial window kept (its true length is used
    for the stats). Compressed codecs raise the honest
    NotImplementedError via decode_wav."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                with wave.open(io.BytesIO(payload), "rb") as w:
                    if w.getsampwidth() != 2:
                        raise NotImplementedError("only PCM16 WAV decoded here")
                    rate = w.getframerate()
                    n = w.getnframes()
                    samples = np.frombuffer(
                        w.readframes(n), dtype=np.int16
                    ).astype(np.float64)
                step = max(1, rate * window_ms // 1000)
                for fi, off in enumerate(range(0, len(samples), step)):
                    win = samples[off:off + step]
                    rms = float(np.sqrt(np.mean(win**2))) if len(win) else 0.0
                    zcr = (
                        float(np.mean(np.signbit(win[1:]) != np.signbit(win[:-1])))
                        if len(win) > 1 else 0.0
                    )
                    out.append({
                        "media_id": int(mid), "frame_idx": fi,
                        "start_sec": off / rate, "rms": rms,
                        "zero_crossing_rate": zcr,
                    })
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FRAMES_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, schema=AUDIO_FRAMES_SCHEMA)
    )


VIDEO_META_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_frames", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("fps", DoubleType()),
])


def video_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL container demux: avih frame count / dimensions /
    rate parsed from each AVI payload (parse_avi). Python touches only
    the header walk; no frame bytes cross into pandas here."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = parse_avi(bytes(payload))
                out.append({
                    "media_id": int(mid),
                    "n_frames": int(meta["n_frames"]),
                    "width": int(meta["width"]),
                    "height": int(meta["height"]),
                    "fps": 1e6 / meta["us_per_frame"],
                })
            yield pd.DataFrame(out, columns=[f.name for f in VIDEO_META_SCHEMA.fields])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, schema=VIDEO_META_SCHEMA)
    )


FRAME_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("feature", ArrayType(DoubleType())),
])


def frame_features(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Model-ready per-frame features from REAL demuxed video: for every
    ``every_n``-th frame, channel mean/std over the raw DIB pixel grid
    (``[mean_B, mean_G, mean_R, std_B, std_G, std_R]``, 0-1 scaled —
    the same feature contract as image_features). ONE parse_avi per
    container feeds all its sampled frames (extract_frames), then numpy
    over each ``width*height*3`` chunk — Arrow-batched mapInPandas, no
    frame bytes shuffled, no per-row Python UDF. Compressed codecs
    (``00dc`` chunks shorter than the raw grid) raise the honest
    NotImplementedError rather than fabricating stats."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                meta = parse_avi(payload)
                w, h = int(meta["width"]), int(meta["height"])
                raw = w * h * 3
                idxs = range(0, int(meta["n_frames"]), every_n)
                for fi, fb in zip(idxs, extract_frames(payload, idxs, meta)):
                    if len(fb) != raw:
                        raise NotImplementedError(
                            f"frame {fi}: {len(fb)} bytes != raw DIB size "
                            f"{raw} — compressed codec, needs libav"
                        )
                    px = np.frombuffer(fb, dtype=np.uint8).reshape(h, w, 3)
                    px = px.astype(np.float64)
                    feat = [
                        *(float(px[..., c].mean()) / 255.0 for c in range(3)),
                        *(float(px[..., c].std()) / 255.0 for c in range(3)),
                    ]
                    out.append({
                        "media_id": int(mid), "frame_idx": int(fi),
                        "width": w, "height": h, "feature": feat,
                    })
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_FEATURES_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, schema=FRAME_FEATURES_SCHEMA)
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling with REAL container metadata: n_frames comes
    from the AVI ``avih`` header (video_metadata), then the sampled index
    list is a JVM sequence+explode — one row per sampled frame, no frame
    bytes shuffled. Downstream frame decode joins back to the payload by
    media_id and slices the movi chunk (extract_frame)."""
    return video_metadata(media).select(
        "media_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
