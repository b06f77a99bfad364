"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark side is REAL — schemas, Arrow batch shapes, partition sizing,
mapInPandas iterator protocol — while the codec kernels are deterministic
fakes / NotImplementedError stubs, because no image/audio libraries ship in
this container. Swapping in PIL/torchaudio/ffmpeg is a one-function change
per kernel; nothing in the Spark plumbing moves.

Design rules for 100 TB of binary payloads:
- binary column stays opaque until the LAST possible stage (no decode before
  filters on metadata columns — let pruning drop rows first);
- mapInPandas (iterator of pandas batches) rather than a scalar UDF, so one
  Python worker streams many Arrow batches without per-row overhead;
- spark.sql.files.maxPartitionBytes + maxRecordsPerBatch bound peak memory:
  decoded frames never exceed one batch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: derives a stable
    pseudo-pixel array from the payload bytes. Replace with PIL.Image.open
    in production — signature and output contract (H x W x 3 uint8) hold."""
    h = (sum(payload[:16]) % 48) + 16 if payload else 16
    w = (sum(payload[16:32]) % 48) + 16 if len(payload) > 16 else 16
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _decode_audio(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "audio decode requires torchaudio/soundfile (not in this container); "
        "the mapInPandas plumbing in audio_features() is real — plug a "
        "decoder in here"
    )


def image_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    emb_dim: int = 16,
) -> DataFrame:
    """binary image column -> (media_id, width, height, embedding).

    mapInPandas streams Arrow batches; per batch the kernel decodes, resizes
    (fake: block-mean), and emits a small embedding. Column pruning: only
    (id, payload) ever reach Python."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "embedding": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = _fake_decode_image(bytes(payload) if payload is not None else b"")
                h, w, _ = img.shape
                # "feature extraction": channel-wise block means -> emb_dim
                flat = img.astype(np.float64).mean(axis=2).ravel()
                chunks = np.array_split(flat, emb_dim)
                emb = np.array([c.mean() for c in chunks], dtype=np.float32)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["embedding"].append(emb.tolist())
            yield pd.DataFrame(out)

    pruned = df.select(id_col, payload_col)
    return pruned.mapInPandas(kernel, IMAGE_FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame index.
    The decoder is a stub (frame count derived deterministically from the
    payload length); schema/explode shape is what a real ffmpeg kernel
    would emit."""

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_fp", StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_fp": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                n_frames = max(1, len(raw) // 64)
                for fi in range(0, n_frames, every_n):
                    fp = hashlib.md5(raw + fi.to_bytes(4, "little")).hexdigest()[:16]
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(fi)
                    rows["frame_fp"].append(fp)
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)
