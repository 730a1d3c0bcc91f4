"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride as opaque `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample are
mapInPandas stages with real schemas, partitioning and Arrow batch
shapes. The codec step itself is STUBBED (image/audio libraries are not
in this container): `decode_stub=True` produces a deterministic fake
(seeded from the payload hash) with the correct output schema, and
`decode_stub=False` raises NotImplementedError at the decode boundary —
the Spark-side plumbing around it is real and tested either way.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=256 + (i % 7) * 64, dtype=np.uint8).tobytes()
        rows.append(
            (i, kind, bytearray(payload), f"{kind}/x-fake", 32 + i % 16, 32, 1000 + i)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real codec: feature = normalized
    byte-histogram projection seeded by the payload itself."""
    b = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(b, minlength=256).astype(np.float32)
    hist /= max(hist.sum(), 1.0)
    return hist[:dim]


def extract_features(df: DataFrame, dim: int = 64, decode_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction over media payloads.

    Real pipeline shape: batched Arrow transfer of binary payloads,
    numpy work per batch, fixed-width float feature out. Swap
    `_fake_decode` for a real codec when libraries are available.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this environment; run with decode_stub=True"
                )
            feats = [
                _fake_decode(bytes(p), dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(gen, FEATURE_SCHEMA)


def resize_images(df: DataFrame, out_w: int = 64, out_h: int = 64, decode_stub: bool = True) -> DataFrame:
    """Image resize plan: batched binary in -> binary out + new dims.

    The codec is stubbed (deterministic payload transform with the right
    output schema/size bookkeeping); the Spark-side shape — binary column
    through mapInPandas with metadata columns updated — is the real
    production plumbing.
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real image resize needs codec libs")
            outs = []
            for p in pdf["payload"]:
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                n = out_w * out_h
                # deterministic fake resample: tile/truncate to target size
                outs.append(np.resize(b, n).tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": outs,
                    "width": out_w,
                    "height": out_h,
                }
            )

    imgs = df.where(F.col("kind") == "image")
    return imgs.select("media_id", "payload").mapInPandas(gen, schema)


def frame_sample(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp
    (JVM-side explode; the decode of each frame is the stubbed stage)."""
    vids = df.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
