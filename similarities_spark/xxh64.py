"""Pure-Python xxHash64 — bit-identical to Spark's `xxhash64` expression.

Why: the query path needs bucket = pmod(xxhash64(term), B) for PARTITION
PRUNING literals. Computing it through Spark costs one extra job per search
batch (createDataFrame + collect over the term list); hashing driver-side
removes that job. The algorithm is the public xxHash64 (Yann Collet,
github.com/Cyan4973/xxHash, BSD) that Spark's XxHash64 expression
implements; Spark's SQL function fixes seed=42 and hashes the string's
UTF-8 bytes. Parity with the JVM implementation is fuzz-gated in
tests/test_r3_fixes.py (ASCII + CJK + empty + long strings) — any
divergence there would silently mis-prune, so the gate is load-bearing.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _merge(h: int, acc: int) -> int:
    return ((h ^ _round(0, acc)) * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned 64-bit xxHash64 of ``data`` (Spark SQL default seed 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M
        a2 = (seed + _P2) & _M
        a3 = seed & _M
        a4 = (seed - _P1) & _M
        while i + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, i)
            a1, a2, a3, a4 = (
                _round(a1, l1),
                _round(a2, l2),
                _round(a3, l3),
                _round(a4, l4),
            )
            i += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M
        for a in (a1, a2, a3, a4):
            h = _merge(h, a)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = (_rotl(h ^ _round(0, k), 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl(h ^ (k * _P1) & _M, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """Two's-complement signed view — what Spark's LongType carries."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= 1 << 63 else h


def term_bucket(term: str, num_buckets: int) -> int:
    """pmod(xxhash64(term), num_buckets) exactly as the index writer
    computes the partition column (Python % == Spark pmod for positive
    modulus)."""
    return xxh64_signed(term.encode("utf-8")) % num_buckets
