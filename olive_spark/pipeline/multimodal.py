"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns next to typed
metadata, processed in Arrow batches via ``mapInPandas``. The actual
decoders (PIL/ffmpeg/etc.) are NOT in this environment, so the decode
step is a clearly-marked stub: ``decode_stub='fake'`` produces a
deterministic fake feature vector from the bytes (so the Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — is real
and tested); ``decode_stub='raise'`` raises NotImplementedError where a
real decoder would plug in.
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


def extract_features(media: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """media table -> per-item feature vectors, Arrow-batched.

    The partition/batch shape is the real production shape: one
    ``mapInPandas`` over payload batches, feature arrays out. Swap
    ``_fake_decode`` for a real decoder without touching the plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not in this env"
                )
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
    + typed metadata out) is the production shape; the pixel work is
    the stub slot: ``fake`` emits a deterministic payload derived from
    (bytes, target size) so downstream operators (dedup, features) are
    testable; ``raise`` marks where PIL/libvips plugs in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real image resize requires PIL/libvips — not in this env"
                )
            payloads = [
                hashlib.sha256(bytes(p) + f"{width}x{height}".encode()).digest()
                * max(1, (width * height) // 2048)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "mime": pdf["mime"],
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
