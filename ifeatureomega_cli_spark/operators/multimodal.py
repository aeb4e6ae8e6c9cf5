"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schemas, batch shapes, partition sizing) is real
and tested; the actual media decoding is STUBBED — the container has no
image/audio libraries — behind `decode_image_stub` (deterministic fake) so
the pipeline is verifiable end-to-end.  Swap the stub for PIL/torchaudio on
a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("payload", BinaryType()),    # opaque encoded bytes
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("codec", StringType()),
    ])),
])

FEATURE_SCHEMA = ("media_id long, kind string, n_bytes long, "
                  "digest string, feature array<float>")


def decode_image_stub(payload: bytes, out_dim: int = 16) -> np.ndarray:
    """Deterministic fake 'decode + embed': SHA-256 of the payload expanded
    to out_dim floats in [0, 1).  Replace with a real decoder on a cluster.

    Raising path kept for parity with real decoders:
    >>> decode_image_stub(None)
    Traceback (most recent call last):
    ...
    ValueError: empty payload
    """
    if not payload:
        raise ValueError("empty payload")
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((out_dim * 4) // len(h) + 1))[: out_dim * 4],
                        dtype=np.uint32)
    return (raw % 1_000_003).astype(np.float32) / 1_000_003.0


def extract_media_features(
    df: DataFrame, out_dim: int = 16, batch_rows: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Media rows are large — bound Arrow batches via
    spark.sql.execution.arrow.maxRecordsPerBatch (set smaller than for token
    tables) and repartition by size tier before calling at scale."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, digests, nbytes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                nbytes.append(len(b))
                digests.append(hashlib.sha256(b).hexdigest() if b else "")
                try:
                    feats.append(decode_image_stub(b, out_dim).tolist())
                except ValueError:
                    feats.append(None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": nbytes,
                "digest": digests,
                "feature": feats,
            })

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (seeded payload bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(rng.randint(64, 4096))
        rows.append((
            i, kind, bytearray(payload),
            (64 * (1 + i % 4), 64 * (1 + i % 3), 1 + i % 30, 16000, "fake"),
        ))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
