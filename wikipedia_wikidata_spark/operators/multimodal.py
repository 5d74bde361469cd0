"""Multimodal columns: opaque binary payloads + typed metadata, processed by
Arrow-batched mapInPandas (the Spark-side plumbing is real and tested; the
actual image decode is STUBBED — no imaging libs in this container).

media spans (kind='media', media_ref='img://<hash>') become a media table with
a deterministic fake binary payload; ``media_features`` runs a batched
"decode + feature extract" over it. Set use_real_decoder=True to hit the
NotImplementedError where a real decoder (PIL/ffmpeg) would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType, StructField,
    StructType,
)

FEATURE_DIM = 8

MEDIA_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("media_ref", StringType()),
    StructField("caption", StringType()),
    StructField("payload", BinaryType()),
])

FEATURES_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("media_ref", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("feature", ArrayType(FloatType())),
])


def media_table(docs: DataFrame) -> DataFrame:
    """Media spans -> (doc_id, media_ref, caption, payload binary).

    Payload is a deterministic fake: md5(media_ref) digest bytes — stands in
    for real image bytes so partitioning/batching behavior is realistic."""
    s = docs.select("doc_id", F.explode("spans").alias("s")).filter(
        F.col("s.kind") == "media"
    )
    return s.select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.text").alias("caption"),
        F.unhex(F.md5(F.col("s.media_ref").cast("binary"))).alias("payload"),
    )


def media_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched decode + feature extraction over binary payloads.

    The stub derives (width, height, n_frames, 8-dim feature) from the payload
    bytes deterministically; a real decoder would replace _decode_batch."""

    def _decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if use_real_decoder:
                raise NotImplementedError(
                    "real image decode needs PIL/ffmpeg; not in this container"
                )
            payloads = pdf["payload"].to_numpy()
            b = np.frombuffer(b"".join(payloads), dtype=np.uint8).reshape(len(pdf), 16)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "width": (256 + b[:, 0].astype(np.int32) * 4),
                    "height": (256 + b[:, 1].astype(np.int32) * 4),
                    "n_frames": (1 + (b[:, 2].astype(np.int32) % 8)),
                    "feature": [
                        (row / 255.0).astype(np.float32).tolist()
                        for row in b[:, :FEATURE_DIM]
                    ],
                }
            )
            yield out

    return media.mapInPandas(_decode_batch, FEATURES_SCHEMA)


def fake_decode_reference(media_ref: str) -> tuple[int, int, int, list[float]]:
    """Python-side oracle for the stub decode (used by tests)."""
    d = hashlib.md5(media_ref.encode()).digest()
    b = list(d)
    return (
        256 + b[0] * 4,
        256 + b[1] * 4,
        1 + b[2] % 8,
        [np.float32(x / 255.0) for x in b[:FEATURE_DIM]],
    )
