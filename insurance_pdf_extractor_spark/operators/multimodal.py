"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` stages.

The decode step is STUBBED (image/audio codecs are not in this
container): ``decode_media`` raises ``NotImplementedError`` unless the
deterministic fake decoder is selected. The Spark-side plumbing —
schema, batch shape, partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_ASSET = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),      # image | audio | video
        T.StructField("payload", T.BinaryType(), True),    # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha1", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_media(payload: bytes, mime: str):
    """Real decode entry point — requires PIL/ffmpeg, not in this
    container. Kept as the explicit extension seam."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg; use fake_features for the deterministic test path"
    )


def fake_features(payload: bytes, n: int = 16) -> list[float]:
    """Deterministic stand-in decoder: 16-bin byte histogram, L1
    normalized. Same contract (bytes → float vector) as a real decoder."""
    if not payload:
        return [0.0] * n
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=n, range=(0, 256))
    total = float(hist.sum()) or 1.0
    return (hist / total).astype(np.float32).tolist()


def extract_media_features(assets: DataFrame, use_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow batch
    shape: pdf columns (media_ref, kind, payload, mime); one output row
    per asset. Partitioning is inherited — repartition upstream by
    hash(media_ref) for balance when payload sizes are skewed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                b = bytes(payload) if payload is not None else b""
                if use_fake:
                    feats.append(fake_features(b))
                else:
                    feats.append(decode_media(b, mime))
                shas.append(hashlib.sha1(b).hexdigest())
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "sha1": shas,
                    "features": feats,
                }
            )

    return assets.select("media_ref", "kind", "payload", "mime").mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video assets: emits one row per
    sampled timestamp (decode stubbed — frame payloads are null until a
    real codec is wired in). Demonstrates the explode-by-duration shape
    a real sampler uses."""
    frames = F.when(
        F.col("kind") == "video",
        F.transform(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0))),
            lambda i: i * every_ms,
        ),
    ).otherwise(F.array().cast("array<int>"))
    return (
        assets.withColumn("frame_ts", F.explode(frames))
        .select("media_ref", "frame_ts", F.lit(None).cast("binary").alias("frame_payload"))
    )
