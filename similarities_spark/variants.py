"""BM25 variant math (Okapi / BM25L / BM25Plus), shared by the oracle and
the distributed scorer. One physical index serves all variants: blocks store
raw (doc_id, tf, dl) + per-term df, so idf and contributions are recomputed
at decode time per variant.

Formulas follow the reference exactly (semantics, not code —
reference similarities/utils/rank_bm25.py):
- okapi idf  = ln(N-df+0.5) - ln(df+0.5), epsilon-floored   (:88-98)
- okapi s   += idf * tf(k1+1) / (tf + k1(1-b+b·dl/avgdl))   (:108-113)
- bm25l idf  = ln(N+1) - ln(df+0.5)                         (:125-127)
- bm25l s   += idf * tf(k1+1)(ctd+δ) / (k1+ctd+δ),
               ctd = tf/(1-b+b·dl/avgdl), δ=0.5             (:130-138)
- plus  idf  = ln((N+1)/df)                                 (:149-151)
- plus  s   += idf * (δ + tf(k1+1)/(k1(1-b+b·dl/avgdl)+tf)), δ=1
               — note the +δ applies to EVERY doc for a known query term
               (docs with tf=0 included), so scores carry a per-query
               constant baseline; ranking is the matched part shifted. (:154-161)

All float64, expression shapes mirrored so accumulating per query token in
order reproduces the reference bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np

DELTAS = {"okapi": 0.0, "bm25l": 0.5, "bm25plus": 1.0}


def idf_fn(variant: str, n_docs: int):
    if variant == "okapi":
        # caller applies the epsilon floor (needs the global average)
        return lambda df: math.log(n_docs - df + 0.5) - math.log(df + 0.5)
    if variant == "bm25l":
        return lambda df: math.log(n_docs + 1) - math.log(df + 0.5)
    if variant == "bm25plus":
        return lambda df: math.log((n_docs + 1) / df)
    raise ValueError(f"unknown variant {variant!r}")


def matched_contribs(
    variant: str,
    tf: np.ndarray,
    dl: np.ndarray,
    idf: float,
    avgdl: float,
    k1: float,
    b: float,
    delta: float,
) -> np.ndarray:
    """Per-posting contribution of one query-token occurrence for docs that
    CONTAIN the term (tf>0), with the reference's expression shape."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    if variant == "okapi":
        return idf * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)))
    if variant == "bm25l":
        ctd = tf / (1 - b + b * dl / avgdl)
        return idf * tf * (k1 + 1) * (ctd + delta) / (k1 + ctd + delta)
    if variant == "bm25plus":
        return idf * (
            delta + (tf * (k1 + 1)) / (k1 * (1 - b + b * dl / avgdl) + tf)
        )
    raise ValueError(f"unknown variant {variant!r}")


def unmatched_contrib(variant: str, idf: float, delta: float) -> float:
    """Contribution of one known-query-token occurrence for a doc WITHOUT
    the term (tf=0). Zero except BM25Plus's lower-bound delta."""
    if variant == "bm25plus":
        return idf * (delta + 0.0)
    return 0.0
