"""Vendored single-node BM25 oracle for parity testing.

A from-scratch numpy implementation of exactly the math the reference computes
(public Okapi BM25 with the ATIRE epsilon floor; see reference
similarities/utils/rank_bm25.py:71-114 and literal_similarity.py:408-442 for
the semantics being matched — no code is copied):

- idf(t)     = ln(N - df + 0.5) - ln(df + 0.5)
- avg_idf    = mean of RAW idf over the full vocabulary (before flooring)
- floor      : idf < 0  ->  epsilon * avg_idf
- contrib    = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
- score(q,d) = sum over query tokens IN TOKEN ORDER (duplicates per occurrence)
- ranking    : stable sort desc by score  ==  (score desc, doc_id asc);
               ALL docs are rankable, so zero-score docs pad the top-k.

Everything is float64 so the distributed engine can assert bit-identical
scores against this oracle.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import math

import numpy as np

from similarities_spark.tokenize import tokenize_text


class BM25Oracle:
    def __init__(
        self,
        corpus_tokens: Sequence[Sequence[str]],
        k1: float = 1.5,
        b: float = 0.75,
        epsilon: float = 0.25,
        variant: str = "okapi",
        delta: Optional[float] = None,
    ):
        from similarities_spark.variants import DELTAS

        self.k1 = k1
        self.b = b
        self.epsilon = epsilon
        self.variant = variant
        self.delta = DELTAS[variant] if delta is None else delta
        self.n_docs = len(corpus_tokens)
        self.doc_len = np.array([len(d) for d in corpus_tokens], dtype=np.float64)
        self.avgdl = float(self.doc_len.sum()) / self.n_docs if self.n_docs else 0.0
        self.doc_freqs: List[Dict[str, int]] = [dict(Counter(d)) for d in corpus_tokens]
        nd: Dict[str, int] = {}
        for freqs in self.doc_freqs:
            for term in freqs:
                nd[term] = nd.get(term, 0) + 1
        self.df = nd
        self.idf: Dict[str, float] = {}
        if variant == "okapi":
            idf_sum = 0.0
            negative = []
            for term, df in nd.items():
                idf = math.log(self.n_docs - df + 0.5) - math.log(df + 0.5)
                self.idf[term] = idf
                idf_sum += idf
                if idf < 0:
                    negative.append(term)
            self.average_idf = idf_sum / len(self.idf) if self.idf else 0.0
            eps = self.epsilon * self.average_idf
            for term in negative:
                self.idf[term] = eps
        elif variant == "bm25l":
            self.average_idf = 0.0
            for term, df in nd.items():
                self.idf[term] = math.log(self.n_docs + 1) - math.log(df + 0.5)
        elif variant == "bm25plus":
            self.average_idf = 0.0
            for term, df in nd.items():
                self.idf[term] = math.log((self.n_docs + 1) / df)
        else:
            raise ValueError(f"unknown variant {variant!r}")

    @classmethod
    def from_texts(
        cls,
        texts: Sequence[str],
        stopwords: Optional[Iterable[str]] = None,
        **kw,
    ) -> "BM25Oracle":
        toks = [tokenize_text(t, mode="corpus", stopwords=stopwords) for t in texts]
        return cls(toks, **kw)

    def get_scores(self, query_tokens: Sequence[str]) -> np.ndarray:
        """Dense float64 score vector over all docs, accumulated per query
        token in order — the reproducibility contract for the engine."""
        scores = np.zeros(self.n_docs, dtype=np.float64)
        doc_len = self.doc_len
        k1, b, delta = self.k1, self.b, self.delta
        for q in query_tokens:
            tf = np.array(
                [(d.get(q) or 0) for d in self.doc_freqs], dtype=np.float64
            )
            idf = self.idf.get(q) or 0.0
            if self.variant == "okapi":
                scores += idf * (
                    tf * (k1 + 1) / (tf + k1 * (1 - b + b * doc_len / self.avgdl))
                )
            elif self.variant == "bm25l":
                ctd = tf / (1 - b + b * doc_len / self.avgdl)
                scores += idf * tf * (k1 + 1) * (ctd + delta) / (k1 + ctd + delta)
            else:  # bm25plus — note unknown terms (idf 0) still add 0*delta=0
                scores += idf * (
                    delta
                    + (tf * (k1 + 1))
                    / (k1 * (1 - b + b * doc_len / self.avgdl) + tf)
                )
        return scores

    def most_similar(
        self, query_tokens: Sequence[str], topn: int = 10
    ) -> List[Tuple[int, float]]:
        scores = self.get_scores(query_tokens)
        order = sorted(range(self.n_docs), key=lambda i: scores[i], reverse=True)
        return [(i, float(scores[i])) for i in order[:topn]]
