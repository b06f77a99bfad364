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


# ---------------------------------------------------------------------------
# perceptual image hashes (reference utils/imagehash.py:159-238, powering
# ImageHashSimilarity in reference image_similarity.py). The bit math is
# pure numpy over the decoded H x W x 3 array; only the resize kernel
# differs from the reference's PIL LANCZOS (area-mean binning here — PIL is
# not in this container; when it is, swap _gray_resize for
# Image.convert('L').resize(..., LANCZOS) and the hash math is unchanged).

IMAGE_HASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ahash", LongType()),
        StructField("dhash", LongType()),
        StructField("phash", LongType()),
    ]
)


def _gray_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Grayscale (ITU-R 601-2, PIL 'L' weights) + deterministic area-mean
    resize to (out_h, out_w)."""
    gray = (
        img[..., 0] * (299.0 / 1000.0)
        + img[..., 1] * (587.0 / 1000.0)
        + img[..., 2] * (114.0 / 1000.0)
    )
    # target-driven slice means: target cell i covers source rows
    # [i*h//out, max(that+1, (i+1)*h//out)) — every cell samples >= 1 source
    # pixel, handling both down- and up-scaling deterministically
    def axis_mean(a: np.ndarray, out_n: int, axis: int) -> np.ndarray:
        n = a.shape[axis]
        starts = (np.arange(out_n) * n) // out_n
        ends = np.maximum(starts + 1, (np.arange(1, out_n + 1) * n) // out_n)
        cs = np.cumsum(a, axis=axis)
        zero_shape = list(a.shape)
        zero_shape[axis] = 1
        cs = np.concatenate([np.zeros(zero_shape), cs], axis=axis)
        sums = np.take(cs, ends, axis=axis) - np.take(cs, starts, axis=axis)
        widths = (ends - starts).astype(np.float64)
        shape = [1, 1]
        shape[axis] = out_n
        return sums / widths.reshape(shape)

    return axis_mean(axis_mean(gray, out_h, 0), out_w, 1)


def _dct2(p: np.ndarray) -> np.ndarray:
    """Unnormalized type-II DCT along both axes (scipy.fftpack.dct
    semantics: X_k = 2 * sum_n x_n cos(pi*(2n+1)*k/(2N)) — the reference
    calls scipy.fftpack.dct(dct(pixels, axis=0), axis=1),
    imagehash.py:195-198)."""
    h, w = p.shape
    n0 = np.arange(h)
    k0 = np.arange(h)[:, None]
    d0 = 2.0 * np.cos(np.pi * (2 * n0 + 1) * k0 / (2.0 * h))
    n1 = np.arange(w)
    k1 = np.arange(w)[:, None]
    d1 = 2.0 * np.cos(np.pi * (2 * n1 + 1) * k1 / (2.0 * w))
    return d0 @ p @ d1.T


def _bits_to_i64(bits: np.ndarray) -> int:
    """Row-major bit array -> signed int64 (first bit = MSB, two's
    complement) — same packing simhash64 uses, so hamming is
    bit_count(a XOR b) in pure SQL."""
    v = 0
    for b in bits.ravel():
        v = (v << 1) | int(bool(b))
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def ahash_bits(img: np.ndarray, hash_size: int = 8) -> np.ndarray:
    """Average hash: pixels > mean over an 8x8 grayscale reduction
    (reference imagehash.py:159-180)."""
    p = _gray_resize(img, hash_size, hash_size)
    return p > p.mean()


def dhash_bits(img: np.ndarray, hash_size: int = 8) -> np.ndarray:
    """Difference hash: horizontal gradient sign over an (8+1)x8 reduction
    (reference imagehash.py:220-236: resize(hash_size+1, hash_size) = width
    hash_size+1, height hash_size; diff between adjacent columns)."""
    p = _gray_resize(img, hash_size, hash_size + 1)
    return p[:, 1:] > p[:, :-1]


def phash_bits(
    img: np.ndarray, hash_size: int = 8, highfreq_factor: int = 4
) -> np.ndarray:
    """Perceptual hash: low-frequency 8x8 corner of the 2-D DCT of a 32x32
    reduction, thresholded at its median (reference imagehash.py:183-200)."""
    s = hash_size * highfreq_factor
    p = _gray_resize(img, s, s)
    low = _dct2(p)[:hash_size, :hash_size]
    return low > np.median(low)


def image_hashes(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hash_size: int = 8,
) -> DataFrame:
    """binary image column -> (media_id, ahash, dhash, phash) int64 columns.

    Same mapInPandas shape as image_features; downstream near-dup joins are
    pure Catalyst (16-bit chunk blocking + bit_count verify — reuse
    dedup.simhash_hamming_pairs on any of the hash columns)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "ahash": [], "dhash": [], "phash": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = _fake_decode_image(
                    bytes(payload) if payload is not None else b""
                )
                out["media_id"].append(mid)
                out["ahash"].append(_bits_to_i64(ahash_bits(img, hash_size)))
                out["dhash"].append(_bits_to_i64(dhash_bits(img, hash_size)))
                out["phash"].append(_bits_to_i64(phash_bits(img, hash_size)))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(kernel, IMAGE_HASH_SCHEMA)


def image_hash_hamming_pairs(hashes: DataFrame, id_col: str = "media_id") -> DataFrame:
    """All-pairs hamming distances over the three perceptual hashes:
    (id_a, id_b, ham_a, ham_d, ham_p), id_a < id_b — the relational
    near-dup stage downstream of image_hashes, kept fully SQL-expressible
    (bit_count(a XOR b)) so an external engine can verify it bit-for-bit.

    This surface is for BOUNDED media sets (per-bucket diagnostics, oracle
    checks): it is a deliberate O(n^2) self-join. The web-scale path blocks
    candidates first — dedup.simhash_hamming_pairs applies 16-bit-chunk
    banding + the degenerate-bucket cap to any single int64 hash column and
    is the operator to reach for at corpus scale."""
    a, b = hashes.alias("a"), hashes.alias("b")
    ac, bc = F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
    return a.join(b, ac < bc).select(
        ac.alias("id_a"),
        bc.alias("id_b"),
        F.bit_count(F.col("a.ahash").bitwiseXOR(F.col("b.ahash"))).alias("ham_a"),
        F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))).alias("ham_d"),
        F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias("ham_p"),
    )


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
