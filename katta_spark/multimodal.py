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
            feats = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                px = _decode_stub(bytes(payload), int(w), int(h))
                # fake embedding: histogram of the fake pixels (deterministic)
                hist, _ = np.histogram(px, bins=feat_dim, range=(0, 256))
                feats.append((hist / max(1, px.size)).astype(np.float32))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": [f.tolist() for f in feats]}
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
            ids, idxs, tss, payloads = [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n_frames = max(1, int(dur) // every_ms)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    # STUB: real impl decodes the frame; fake = payload hash + idx
                    payloads.append(
                        hashlib.sha256(bytes(payload) + i.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_ts_ms": tss,
                    "frame_payload": payloads,
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
