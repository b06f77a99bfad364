"""Tokenization — the only Python kernel on the ingest path.

Semantics mirror the reference's two modes
(reference similarities/literal_similarity.py:408-414 corpus, :434 query):

- corpus mode: tokenize, then drop any token whose ``w.strip().lower()`` is a
  stopword or whose stripped form is empty;
- query mode: tokenize only — NO stopword filter, duplicates kept, order kept
  (duplicate query tokens are scored once per occurrence downstream).

The reference tokenizes with jieba. jieba is optional here: when importable we
use ``jieba.lcut`` (accurate mode, HMM on — the reference's call); otherwise a
deterministic regex fallback segments text as

    [A-Za-z0-9_]+ runs | single CJK codepoint | single other non-space char.

The fallback never emits whitespace tokens. That is score-equivalent to jieba
for whitespace (corpus mode strips them via the empty-token filter; in query
mode whitespace tokens match nothing and contribute exactly 0.0), so parity
tests hold for any tokenizer as long as engine and oracle share it.

Executor-side transport is a pandas UDF over Arrow batches (no per-row Python
at the DataFrame level); jieba's dictionary init (~1s) amortizes per worker.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

try:  # optional; the container does not ship jieba
    import jieba as _jieba

    _jieba.initialize()
    HAS_JIEBA = True
except Exception:  # pragma: no cover - environment dependent
    _jieba = None
    HAS_JIEBA = False

# latin/digit runs, or any single non-space char (CJK chars come out one by one)
_FALLBACK_RE = re.compile(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")


def _segment(text: str) -> List[str]:
    if text is None:
        return []
    if HAS_JIEBA:
        return _jieba.lcut(text)
    return _FALLBACK_RE.findall(text)


def tokenize_text(
    text: str,
    mode: str = "corpus",
    stopwords: Optional[Iterable[str]] = None,
) -> List[str]:
    """Pure-Python tokenizer shared by the Spark UDF and the numpy oracle."""
    toks = _segment(text)
    if mode == "query":
        return toks
    sw = stopwords if stopwords is not None else ()
    sw = sw if isinstance(sw, (set, frozenset)) else frozenset(sw)
    # reference literal_similarity.py:412-413
    return [w for w in toks if (w.strip().lower() not in sw) and len(w.strip()) > 0]


def make_tokenizer_udf(mode: str = "corpus", stopwords: Optional[frozenset] = None):
    """Arrow-vectorized tokenizer: string column -> array<string> column.

    ``stopwords`` is captured in the closure and shipped once per task via
    pickle (it is a plain frozenset, ~50KB for the reference's 1178-entry
    list) — the UDF itself runs over whole Arrow batches.
    """
    sw = frozenset(stopwords or ())

    @F.pandas_udf(ArrayType(StringType()))
    def _tokenize(col: pd.Series) -> pd.Series:
        return col.map(lambda t: tokenize_text(t, mode=mode, stopwords=sw))

    return _tokenize


def load_stopwords(path: str) -> frozenset:
    """Load a newline-delimited stopword file (reference utils/tfidf.py:17-24:
    each line stripped, added verbatim to a set). Missing file -> empty set."""
    import os

    if not path or not os.path.exists(path):
        return frozenset()
    with open(path, "r", encoding="utf-8") as f:
        return frozenset(line.strip() for line in f)
