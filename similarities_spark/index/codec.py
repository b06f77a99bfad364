"""Posting-block codec: docID-delta + varint compression, numpy-vectorized.

A posting block packs up to ``block_size`` postings of one (term, salt)
segment, sorted by doc_id, into a single binary payload:

    header : varint(len(docid_stream)) varint(len(tf_stream))
    streams: varint(delta doc_ids, first absolute) | varint(tf) | varint(dl)

tf and dl are stored (not precomputed float contributions) so the payload
stays ~3-6 bytes/posting at 10^12-doc scale; the exact float64 BM25
contribution is recomputed at decode time from (tf, dl, idf, avgdl) with the
reference's expression shape (see ``contribs``), which keeps scores
bit-identical to the oracle.

Everything here is branch-light numpy over whole blocks — no per-posting
Python in the hot path. The per-value loops below iterate over the MAX VARINT
BYTE LENGTH (<=10), not over postings.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_SEVEN = np.uint64(7)
_MASK = np.uint64(0x7F)


def varint_encode_with_lengths(values: np.ndarray):
    """LEB128-encode a uint64 array -> (bytes, per-value byte length array).
    Vectorized over values; loops only over max varint width (<=10)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nb = np.ones(v.shape, dtype=np.int64)
    rest = v >> _SEVEN
    while rest.any():
        nb += rest > 0
        rest >>= _SEVEN
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    pos = np.zeros(v.shape, dtype=np.int64)
    np.cumsum(nb[:-1], out=pos[1:])
    work = v.copy()
    for i in range(int(nb.max())):
        mask = nb > i
        byte = (work & _MASK).astype(np.uint8)
        cont = np.where(nb > i + 1, np.uint8(0x80), np.uint8(0))
        out[pos[mask] + i] = byte[mask] | cont[mask]
        work >>= _SEVEN
    return out.tobytes(), nb


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized over values)."""
    return varint_encode_with_lengths(values)[0]


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a full LEB128 stream back to uint64 (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(ends.shape, dtype=np.uint64)
    for i in range(int(lengths.max())):
        mask = lengths > i
        vals[mask] |= (b[starts[mask] + i] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(
            7 * i
        )
    return vals


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    """doc_ids must be sorted ascending; streams are length-prefixed."""
    deltas = np.empty_like(doc_ids, dtype=np.uint64)
    d = np.asarray(doc_ids, dtype=np.uint64)
    deltas[0] = d[0]
    np.subtract(d[1:], d[:-1], out=deltas[1:])
    s_doc = varint_encode(deltas)
    s_tf = varint_encode(np.asarray(tfs, dtype=np.uint64))
    s_dl = varint_encode(np.asarray(dls, dtype=np.uint64))
    header = varint_encode(np.array([len(s_doc), len(s_tf)], dtype=np.uint64))
    return header + s_doc + s_tf + s_dl


def decode_block(payload: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (doc_ids int64 sorted, tf int64, dl int64)."""
    b = memoryview(payload)
    # header = exactly two varints; find their end by scanning stop bits
    arr = np.frombuffer(b, dtype=np.uint8)
    stops = np.flatnonzero((arr & 0x80) == 0)
    header_end = int(stops[1]) + 1
    len_doc, len_tf = (int(x) for x in varint_decode(bytes(b[:header_end])))
    o1 = header_end
    o2 = o1 + len_doc
    o3 = o2 + len_tf
    deltas = varint_decode(bytes(b[o1:o2]))
    doc_ids = np.cumsum(deltas.astype(np.int64))
    tfs = varint_decode(bytes(b[o2:o3])).astype(np.int64)
    dls = varint_decode(bytes(b[o3:])).astype(np.int64)
    return doc_ids, tfs, dls


def encode_blocks_batch(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, block_size: int
):
    """Encode a whole (term, salt) SEGMENT into block payloads with three
    vectorized varint passes (not four per block): per-block delta chains
    (first value absolute), then byte-sliced per block.

    -> list of (payload bytes, start_index, end_index) per block.
    """
    n = doc_ids.size
    starts = np.arange(0, n, block_size, dtype=np.int64)
    d = np.asarray(doc_ids, dtype=np.uint64)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = d[0]
    np.subtract(d[1:], d[:-1], out=deltas[1:])
    deltas[starts] = d[starts]  # delta chain restarts per block
    s_doc, nb_doc = varint_encode_with_lengths(deltas)
    s_tf, nb_tf = varint_encode_with_lengths(np.asarray(tfs, dtype=np.uint64))
    s_dl, nb_dl = varint_encode_with_lengths(np.asarray(dls, dtype=np.uint64))
    cum_doc = np.concatenate([[0], np.cumsum(nb_doc)])
    cum_tf = np.concatenate([[0], np.cumsum(nb_tf)])
    cum_dl = np.concatenate([[0], np.cumsum(nb_dl)])
    out = []
    for lo in starts:
        hi = min(lo + block_size, n)
        bd = s_doc[cum_doc[lo] : cum_doc[hi]]
        bt = s_tf[cum_tf[lo] : cum_tf[hi]]
        bl = s_dl[cum_dl[lo] : cum_dl[hi]]
        header = varint_encode(np.array([len(bd), len(bt)], dtype=np.uint64))
        out.append((header + bd + bt + bl, int(lo), int(hi)))
    return out


def decode_blocks_batch(payloads, n_postings) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY blocks at once: three varint_decode calls total instead
    of four per block. The per-call fixed cost (frombuffer/flatnonzero) is
    the query-path hot spot when head terms span thousands of blocks.

    Per-block delta chains restart at an absolute doc id, so the global
    cumsum is corrected per block: ids[i] = C[i] - C[block_start - 1].

    ``n_postings``: posting count per payload (from block metadata).
    -> (doc_ids, tfs, dls) concatenated in payload order.
    """
    doc_parts, tf_parts, dl_parts = [], [], []
    for payload in payloads:
        b = payload
        # header: two varints (stream lengths); stop bytes have high bit 0
        i = 0
        len_doc = shift = 0
        while True:
            byte = b[i]
            len_doc |= (byte & 0x7F) << shift
            i += 1
            if not byte & 0x80:
                break
            shift += 7
        len_tf = shift = 0
        while True:
            byte = b[i]
            len_tf |= (byte & 0x7F) << shift
            i += 1
            if not byte & 0x80:
                break
            shift += 7
        doc_parts.append(b[i : i + len_doc])
        tf_parts.append(b[i + len_doc : i + len_doc + len_tf])
        dl_parts.append(b[i + len_doc + len_tf :])
    deltas = varint_decode(b"".join(doc_parts)).astype(np.int64)
    tfs = varint_decode(b"".join(tf_parts)).astype(np.int64)
    dls = varint_decode(b"".join(dl_parts)).astype(np.int64)
    counts = np.asarray(n_postings, dtype=np.int64)
    C = np.cumsum(deltas)
    starts = np.zeros(counts.shape, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    base = np.where(starts > 0, C[starts - 1], 0)
    doc_ids = C - np.repeat(base, counts)
    return doc_ids, tfs, dls


def contribs(
    tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float, k1: float, b: float
) -> np.ndarray:
    """Exact per-posting BM25 term contribution, float64.

    Mirrors the reference's vectorized expression shape
    (similarities/utils/rank_bm25.py:110-113): idf * (tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl))) so results are bit-identical.
    """
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return idf * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)))
