"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as binary columns; Spark's
job is the PLUMBING — schema, partitioning, Arrow batch shape, sizing —
while the decode itself is a vendored library call. This container has no
image/audio libraries, so the decode step is STUBBED behind a deterministic
fake (clearly marked); everything Spark-side is real and tested:

- media table schema (binary payload + typed metadata struct)
- mapInPandas feature extraction with bounded Arrow batch memory
- frame sampling (video → k frames) as an exploding mapInPandas kernel
- size/partition accounting so batches stay within executor memory

Replace ``_decode_stub`` with a real decoder (PIL/libav/...) to productionize.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media rows (payload = seeded pseudo-random bytes)."""
    df = spark.range(0, n, 1, max(1, n // 10_000 + 1))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    # payload: 64-256 deterministic bytes derived from repeated hashes
    payload = F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256).cast(
        "binary"
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(60000)) + 1000).cast("int").alias("duration_ms"),
        F.lit("application/x-fake").alias("mime"),
    )


def _decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder — deterministic fake pixels from the payload hash.

    A real implementation would be e.g. PIL.Image.open(BytesIO(payload));
    the container has no image libraries (NotImplementedError would also be
    acceptable here, but a deterministic fake keeps the downstream plumbing
    testable end-to-end).
    """
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.integers(0, 256, size=(min(height, 8), min(width, 8), 3), dtype=np.uint8)


def extract_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """(media_id, features array<float>) via one Arrow-batched pass.

    The real pattern at scale: mapInPandas with bounded batches (binary
    payloads make rows heavy — size spark.sql.execution.arrow.
    maxRecordsPerBatch so a batch fits executor memory), one vectorized
    model/decoder call per batch.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # the ONLY per-row step is the decode itself (the stand-in for
            # the vendored library call); all feature math is one
            # vectorized pass over the whole batch (segment bincount)
            pixels = [
                _decode_stub(bytes(p), int(w), int(h))
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            n = len(pixels)
            sizes = np.array([p.size for p in pixels], dtype=np.int64)
            flat = np.concatenate([p.ravel() for p in pixels])
            seg = np.repeat(np.arange(n), sizes)
            # same binning as np.histogram(range=(0,256), bins=feat_dim)
            # for uint8 inputs: bin = v * feat_dim // 256
            bins = flat.astype(np.int64) * feat_dim // 256
            hist = np.bincount(
                seg * feat_dim + bins, minlength=n * feat_dim
            ).reshape(n, feat_dim)
            feats = (
                hist / np.maximum(sizes, 1)[:, None]
            ).astype(np.float32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": [f.tolist() for f in feats],
                }
            )

    return media.select("media_id", "payload", "width", "height").mapInPandas(
        kernel, "media_id long, features array<float>"
    )


def sample_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """(media_id, frame_idx, frame_ts_ms, frame_payload): frame sampling for
    video rows — an exploding kernel (one input row → many frame rows), the
    shape a real ffmpeg-backed sampler would use."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # the explode arithmetic is pure integers — one np.repeat /
            # arange pass for the whole batch, no per-frame Python loop
            dur = pdf["duration_ms"].to_numpy(np.int64)
            n_frames = np.maximum(1, dur // every_ms)
            total = int(n_frames.sum())
            row_of = np.repeat(np.arange(len(pdf)), n_frames)
            idxs = np.arange(total) - np.repeat(
                np.cumsum(n_frames) - n_frames, n_frames
            )
            # STUB frame decode: ONE digest per input media row (the
            # open-the-container stand-in), per-frame payload derived
            # vectorized as digest ⊕ frame_idx bytes
            digests = np.frombuffer(
                b"".join(
                    hashlib.sha256(bytes(p)).digest() for p in pdf["payload"]
                ),
                dtype=np.uint8,
            ).reshape(len(pdf), 32)
            frames = digests[row_of].copy()
            frames[:, :4] ^= (
                idxs.astype("<u4").view(np.uint8).reshape(total, 4)
            )
            fb = frames.tobytes()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64)[row_of],
                    "frame_idx": idxs.astype(np.int32),
                    "frame_ts_ms": (idxs * every_ms).astype(np.int32),
                    "frame_payload": [
                        fb[i * 32 : (i + 1) * 32] for i in range(total)
                    ],
                }
            )

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "payload", "duration_ms")
        .mapInPandas(
            kernel,
            "media_id long, frame_idx int, frame_ts_ms int, frame_payload binary",
        )
    )
