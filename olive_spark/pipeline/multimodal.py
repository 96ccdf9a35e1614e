"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns next to typed
metadata, processed in Arrow batches via ``mapInPandas``.

Decoder status:
- PPM (P6) images: REAL pure-numpy decode / nearest-neighbor resize /
  re-encode (``decode_stub='ppm'`` below) — no PIL needed; golden-
  tested on exact pixels.
- WAV (RIFF PCM) audio: REAL pure-numpy decode / feature extraction
  (``decode_stub='wav'``) — RIFF chunk walk + int16/uint8 PCM samples,
  RMS / zero-crossings / FFT band energies; golden-tested on exact
  round-trip samples.
- Other formats (JPEG/PNG images, compressed audio, video): the codecs
  (PIL/ffmpeg) are NOT in this environment, so those decode steps are
  clearly-marked stubs: ``decode_stub='fake'`` produces a deterministic
  fake from the bytes (the Spark-side plumbing — schema, partitioning,
  UDF signature, batch shape — is real and tested);
  ``decode_stub='raise'`` raises NotImplementedError where the real
  codec would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image|audio|video
        T.StructField("payload", T.BinaryType(), False),   # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decoder': sha256 bytes -> FEATURE_DIM floats
    in [0,1). Stands in for a real image/audio feature extractor."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


# ---------------------------------------------------------------------------
# REAL PPM (P6) codec — pure numpy, no external imaging library.
# Netpbm P6 is a public, trivially-parseable format: ASCII header
# "P6 <width> <height> <maxval>" (whitespace-separated, '#' comments)
# followed by one binary RGB triple per pixel. This makes the image
# operators real end-to-end in this sandbox rather than plumbing-only.
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6, maxval<=255) to an (h, w, 3) uint8 array."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: 3 ASCII ints after the magic, whitespace-separated, with
    # optional '#...' comments; the single whitespace byte after maxval
    # terminates the header.
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape(h, w, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy fancy indexing (deterministic:
    sample index = floor((i + 0.5) * src/dst), the standard pixel-center
    mapping)."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[rows[:, None], cols[None, :]]


def _ppm_features(arr: np.ndarray) -> np.ndarray:
    """Real 16-dim image feature: per-channel mean+std (6), then a
    10-bin grayscale histogram (normalized). Deterministic, numpy-only."""
    f = np.empty(FEATURE_DIM, dtype=np.float32)
    x = arr.astype(np.float64) / 255.0
    f[0:3] = x.mean(axis=(0, 1))
    f[3:6] = x.std(axis=(0, 1))
    gray = x @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(gray, bins=10, range=(0.0, 1.0))
    f[6:16] = hist / max(1, gray.size)
    return f


# ---------------------------------------------------------------------------
# REAL WAV (RIFF PCM) codec — pure numpy, no external audio library.
# Canonical WAV is a public RIFF container: 'RIFF'<size>'WAVE', then
# chunks; 'fmt ' carries (format=1 PCM, channels, sample rate, bits),
# 'data' carries the interleaved samples. 16-bit signed and 8-bit
# unsigned PCM cover the uncompressed cases; everything compressed
# (MP3/AAC/...) stays behind the ffmpeg stub.
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF PCM WAV -> (mono float64 samples in [-1, 1], rate).

    Multi-channel input is averaged to mono. Supports PCM format 1 at
    16-bit signed or 8-bit unsigned depth.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise ValueError(f"compressed WAV (format {audio_format}) needs ffmpeg")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"{bits}-bit PCM not supported")
    if n_channels > 1:
        x = x[: len(x) - len(x) % n_channels].reshape(-1, n_channels).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode mono float samples in [-1, 1] as 16-bit PCM WAV."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = np.round(pcm * 32767.0).astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + int(rate).to_bytes(4, "little") + int(rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def _wav_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """Real 16-dim audio feature: duration_sec, RMS, peak, zero-crossing
    rate, then 12 normalized FFT band energies (log-ish fixed bands up
    to Nyquist). Deterministic, numpy-only."""
    f = np.zeros(FEATURE_DIM, dtype=np.float32)
    n = len(samples)
    if n == 0:
        return f
    f[0] = n / rate
    f[1] = np.sqrt(np.mean(samples**2))
    f[2] = np.abs(samples).max()
    f[3] = np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1]))
    mag = np.abs(np.fft.rfft(samples))
    total = mag.sum()
    if total > 0:
        bands = np.array_split(mag, 12)
        f[4:16] = [b.sum() / total for b in bands]
    return f


def extract_features(media: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """media table -> per-item feature vectors, Arrow-batched.

    The partition/batch shape is the real production shape: one
    ``mapInPandas`` over payload batches, feature arrays out.
    decode_stub='ppm' is a REAL decode: P6 payloads -> per-channel
    mean/std + grayscale histogram features (pure numpy).
    decode_stub='wav' is a REAL decode: RIFF PCM payloads -> duration/
    RMS/ZCR/FFT-band features (pure numpy). 'fake' hashes bytes;
    'raise' marks the PIL/ffmpeg slot for other formats.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not in this env"
                )
            if decode_stub == "ppm":
                feats = [_ppm_features(decode_ppm(bytes(p))) for p in pdf["payload"]]
            elif decode_stub == "wav":
                feats = [_wav_features(*decode_wav(bytes(p))) for p in pdf["payload"]]
            else:
                feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def synth_media(spark, n: int = 64, num_partitions: int = 4) -> DataFrame:
    """Deterministic fake media table for tests/benches."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": [kinds[i % 3] for i in ids],
                    "payload": [
                        (f"payload-{i}".encode() * (10 + i % 7)) for i in ids
                    ],
                    "mime": ["application/octet-stream"] * len(ids),
                    "width": [(64 + i % 512) for i in ids],
                    "height": [(64 + (i * 7) % 512) for i in ids],
                    "duration_ms": [1000 * (i % 30) for i in ids],
                }
            )

    return (
        spark.range(n)
        .repartition(num_partitions, "id")
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


def synth_ppm_media(spark, n: int = 16, num_partitions: int = 2) -> DataFrame:
    """Deterministic REAL P6 images (gradient + id-keyed phase) for the
    ppm decode path — every payload is a valid PPM."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            payloads = []
            dims = []
            for i in ids:
                w, h = 8 + int(i) % 5, 6 + int(i) % 4
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (xx * 255 // max(1, w - 1)).astype(np.uint8),
                        (yy * 255 // max(1, h - 1)).astype(np.uint8),
                        ((xx + yy + int(i)) % 256).astype(np.uint8),
                    ],
                    axis=-1,
                )
                payloads.append(encode_ppm(img))
                dims.append((w, h))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": ["image"] * len(ids),
                    "payload": payloads,
                    "mime": ["image/x-portable-pixmap"] * len(ids),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "duration_ms": [0] * len(ids),
                }
            )

    return (
        spark.range(n)
        .repartition(num_partitions, "id")
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


def synth_wav_media(spark, n: int = 16, num_partitions: int = 2) -> DataFrame:
    """Deterministic REAL PCM WAV clips (id-keyed sine + harmonic) for
    the wav decode path — every payload is a valid 16-bit RIFF WAV."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rate = 8000
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            payloads, durs = [], []
            for i in ids:
                dur = 0.05 + (int(i) % 4) * 0.025  # 50-125 ms clips
                t = np.arange(int(rate * dur)) / rate
                freq = 220.0 * (1 + int(i) % 8)
                x = 0.6 * np.sin(2 * np.pi * freq * t) + 0.3 * np.sin(
                    2 * np.pi * 2 * freq * t
                )
                payloads.append(encode_wav(x, rate))
                durs.append(int(dur * 1000))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": ["audio"] * len(ids),
                    "payload": payloads,
                    "mime": ["audio/wav"] * len(ids),
                    "width": [None] * len(ids),
                    "height": [None] * len(ids),
                    "duration_ms": durs,
                }
            )

    return (
        spark.range(n)
        .repartition(num_partitions, "id")
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mime", T.StringType(), True),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, decode_stub: str = "fake"
) -> DataFrame:
    """Image rows -> resized payloads + corrected metadata.

    Plumbing (filter to kind='image', Arrow batches in, binary payloads
    + typed metadata out) is the production shape. The pixel work:
    ``ppm`` = REAL decode -> nearest-neighbor resize -> re-encode for
    P6 payloads (pure numpy, golden-tested exact pixels); ``fake``
    emits a deterministic payload derived from (bytes, target size) so
    downstream operators (dedup, features) stay testable for formats
    whose codecs aren't in this env; ``raise`` marks where PIL/libvips
    plugs in for those formats.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real image resize requires PIL/libvips — not in this env"
                )
            if decode_stub == "ppm":
                payloads = [
                    encode_ppm(resize_nearest(decode_ppm(bytes(p)), width, height))
                    for p in pdf["payload"]
                ]
                mimes = ["image/x-portable-pixmap"] * len(pdf)
            else:
                payloads = [
                    hashlib.sha256(bytes(p) + f"{width}x{height}".encode()).digest()
                    * max(1, (width * height) // 2048)
                    for p in pdf["payload"]
                ]
                mimes = pdf["mime"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "mime": mimes,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", "mime")
        .mapInPandas(run, schema=RESIZED_SCHEMA)
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    decode_stub: str = "fake",
) -> DataFrame:
    """Video rows -> one row per sampled frame (media_id, frame_idx,
    ts_ms, frame).

    The SAMPLING PLAN is pure built-ins — ``sequence(0, duration_ms,
    every_ms)`` + ``slice`` + ``posexplode`` compute the capped
    timestamp grid JVM-side, so a 2-hour video contributes at most
    ``max_frames`` rows BEFORE any Python runs (no exploded-then-
    filtered waste). Only the per-timestamp frame extraction is the
    stubbed Arrow step (``fake`` = deterministic bytes from
    (payload, ts); ``raise`` marks the ffmpeg slot).
    """
    grid = F.slice(
        F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(int(every_ms))),
        1,
        int(max_frames),
    )
    timestamps = (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", F.posexplode(grid).alias("frame_idx", "ts_ms"))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg — not in this env"
                )
            frames = [
                hashlib.sha256(bytes(p) + int(ts).to_bytes(8, "big")).digest()
                for p, ts in zip(pdf["payload"], pdf["ts_ms"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "ts_ms": pdf["ts_ms"].astype("int64"),
                    "frame": frames,
                }
            )

    return timestamps.mapInPandas(run, schema=FRAME_SCHEMA)
