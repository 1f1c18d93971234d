"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side machinery (schema, partition-preserving ``mapInPandas``, Arrow
batch shapes) is real and tested, while the actual codec step is stubbed
behind ``DECODERS`` — the sandbox ships no image/audio libraries, so the
default decoder is a deterministic fake that derives "features" from the
payload bytes.  Swapping in a real decoder is a one-function change; the
distributed plan is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed step.

    Real deployments replace this with e.g. PIL/torchvision decode +
    encoder inference; it exists so the Arrow batch path is exercised
    end-to-end.  Raises like a real decoder on empty payloads."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload: no codec available in sandbox")
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float32), dim)
    return np.array([float(c.mean()) if len(c) else 0.0 for c in chunks], dtype=np.float32)


DECODERS = {"image": _fake_decode, "audio": _fake_decode, "video": _fake_decode}


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas over Arrow batches: decode each payload, emit a
    fixed-width feature vector.  Partitioning is preserved (no shuffle);
    failed decodes become null features rather than batch aborts."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, nbytes = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                try:
                    decoder = DECODERS[kind]
                    feats.append(decoder(payload, dim).tolist())
                    nbytes.append(len(payload))
                except (KeyError, NotImplementedError):
                    feats.append(None)
                    nbytes.append(0 if payload is None else len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(nbytes, dtype="int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


def make_media_fixture(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8))
        rows.append(
            (
                f"m{i:05d}",
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
