"""Multimodal columns: opaque binary payloads + typed metadata, decoded in
Arrow batches.

Images/audio/video ride as ``binary`` columns with a metadata struct and
are processed with a partition-preserving ``mapInPandas`` (no shuffle, no
per-row UDFs).  All three modalities decode FOR REAL with the pure-stdlib
codecs in functions/codecs.py (PNG: header + inflate + scanline
unfiltering; WAV: RIFF/PCM16 parse; AVI: RIFF movi-chunk walk over
uncompressed 24-bit DIB frames), and the feature step is genuine numpy
signal/pixel statistics:

* image  -> [width, height, aspect, mean/std per RGB channel, 3x3
             grayscale grid means]                       (16 floats)
* audio  -> [duration_s, rms, zero-crossing rate, peak, 12 log-spaced
             FFT magnitude bins]                         (16 floats)
* video  -> [n_frames, fps, width, height, aspect, 8 sampled-frame gray
             means, global std/mean, temporal activity]  (16 floats)

Compressed video codecs (H.264, MJPEG, ...) are declared out of scope:
the codec raises and the row becomes a null feature, never a batch abort.
The fixture writes real PNG/WAV/AVI bytes (plus some deliberately
undecodable video payloads), so tests exercise actual decoding AND the
fallback, not byte-shuffling.
"""

from __future__ import annotations

import struct
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

from name_matching_spark.functions import codecs

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

FEATURE_DIM = 16


def image_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real decode (functions/codecs.png_decode) + pixel statistics."""
    rgb = codecs.png_decode(payload).astype(np.float32)
    h, w, _ = rgb.shape
    gray = rgb.mean(axis=2)
    grid = np.zeros(9, dtype=np.float32)
    ys = np.linspace(0, h, 4).astype(int)
    xs = np.linspace(0, w, 4).astype(int)
    for gy in range(3):
        for gx in range(3):
            cell = gray[ys[gy] : max(ys[gy + 1], ys[gy] + 1),
                        xs[gx] : max(xs[gx + 1], xs[gx] + 1)]
            grid[gy * 3 + gx] = float(cell.mean()) / 255.0
    feats = np.concatenate(
        [
            [float(w), float(h), float(w) / float(h)],
            rgb.reshape(-1, 3).mean(axis=0) / 255.0,
            rgb.reshape(-1, 3).std(axis=0) / 255.0,
            grid[:7],
        ]
    ).astype(np.float32)
    return feats[:dim]


def audio_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real decode (functions/codecs.wav_decode) + numpy DSP statistics."""
    rate, x = codecs.wav_decode(payload)
    if len(x) == 0:
        raise ValueError("empty audio")
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    peak = float(np.abs(x).max())
    spec = np.abs(np.fft.rfft(x))
    # 12 log-spaced magnitude bins (normalized), robust to length
    edges = np.unique(
        np.geomspace(1, len(spec), 13).astype(int)
    )
    bins = np.zeros(12, dtype=np.float32)
    total = spec.sum() or 1.0
    for i in range(min(12, len(edges) - 1)):
        bins[i] = float(spec[edges[i] : edges[i + 1]].sum() / total)
    feats = np.concatenate([[len(x) / rate, rms, zcr, peak], bins]).astype(np.float32)
    return feats[:dim]


def video_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real decode for uncompressed RIFF/AVI (functions/codecs.avi_decode)
    + frame-sampled pixel statistics: container stats, per-sampled-frame
    grayscale means (up to 8 evenly-spaced frames incl. first and last),
    and mean inter-frame absolute difference (temporal activity).
    Compressed codecs (H.264, MJPEG, ...) raise ValueError in the codec —
    declared out of scope — and become null features upstream."""
    fps, frames = codecs.avi_decode(payload)
    n, h, w, _ = frames.shape
    gray = frames.astype(np.float32).mean(axis=3) / 255.0  # (n, h, w)
    k = min(8, n)
    sample_idx = np.linspace(0, n - 1, k).astype(int)
    frame_means = np.zeros(8, dtype=np.float32)
    frame_means[:k] = gray[sample_idx].mean(axis=(1, 2))
    temporal = float(np.abs(np.diff(gray, axis=0)).mean()) if n > 1 else 0.0
    feats = np.concatenate(
        [
            [float(n), float(fps), float(w), float(h), float(w) / float(h)],
            frame_means,
            [gray.std(), gray.mean(), temporal],
        ]
    ).astype(np.float32)
    return feats[:dim]


DECODERS = {"image": image_features, "audio": audio_features, "video": video_features}


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas over Arrow batches: decode each payload, emit a
    fixed-width feature vector.  Partitioning is preserved (no shuffle);
    failed/unsupported decodes become null features rather than batch
    aborts (mirrors the reference's error-record pattern)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, nbytes = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                try:
                    decoder = DECODERS[kind]
                    feats.append([float(v) for v in decoder(payload, dim)])
                except (KeyError, NotImplementedError, ValueError, struct.error):
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
    """Deterministic media table with REAL payloads: random-pixel PNGs,
    sine-plus-noise PCM16 WAVs, opaque bytes for video."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = int(rng.integers(4, 17)), int(rng.integers(4, 17))
            payload = codecs.png_encode(
                rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            )
            meta = (w, h, None)
        elif kind == "audio":
            rate = 8000
            t = np.arange(int(rng.integers(400, 1600))) / rate
            f0 = float(rng.uniform(100, 1000))
            x = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(len(t))
            payload = codecs.wav_encode((x * 20000).astype(np.int16), rate)
            meta = (None, None, int(1000 * len(t) / rate))
        elif (i // 3) % 4 != 3:
            n_f = int(rng.integers(2, 7))
            w, h = int(rng.integers(4, 13)), int(rng.integers(4, 13))
            payload = codecs.avi_encode(
                rng.integers(0, 256, size=(n_f, h, w, 3), dtype=np.uint8), fps=10
            )
            meta = (w, h, int(1000 * n_f / 10))
        else:
            # every 4th video row stays an opaque (compressed-codec stand-in)
            # payload: exercises the declared null-feature fallback
            payload = bytes(rng.integers(0, 256, size=256, dtype=np.uint8))
            meta = (None, None, 1000)
        rows.append(
            (
                f"m{i:05d}",
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                meta[0],
                meta[1],
                meta[2],
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
