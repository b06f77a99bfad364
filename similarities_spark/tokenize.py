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

# latin/digit runs, or any single non-space char (CJK chars come out one by
# one). The whitespace class is EXPLICIT ASCII so Python re, Java regex, and
# RE2 (DuckDB) tokenize byte-identically (Python's \s is Unicode-aware, Java's
# is not — exotic Unicode whitespace would diverge otherwise).
TOKEN_PATTERN = "[A-Za-z0-9_]+|[^ \\t\\n\\r\\f\\x0bA-Za-z0-9_]"
_FALLBACK_RE = re.compile(TOKEN_PATTERN)


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


def _fallback_tagger(text: str):
    """POS-ish tagger for the no-jieba container: regex segmentation with
    coarse flags — 'x' for punctuation-only tokens (dropped by the TFIDF
    filter, like jieba's), 'eng' for latin/digit runs, 'n' otherwise. The
    FILTER math downstream is exactly the reference's; only the segmenter
    differs (same seam as tokenize_text)."""
    for tok in _FALLBACK_RE.findall(text):
        if re.fullmatch(r"[A-Za-z0-9_]+", tok):
            yield tok, "eng"
        elif re.fullmatch(r"[^\w一-鿿]+", tok):
            yield tok, "x"
        else:
            yield tok, "n"


def tokenize_tfidf_text(
    text: str,
    stopwords: Optional[Iterable[str]] = None,
    tagger=None,
) -> List[str]:
    """Reference TFIDF token filter (reference utils/tfidf.py:63-65):
    POS-tagged segmentation, drop tokens whose POS flag STARTS WITH
    'u'/'x'/'w' (particles, non-words, punctuation), then drop stopwords —
    EXCEPT tokens whose stripped length is < 2, which survive the stopword
    filter (the reference's keep-if-len<2 quirk, replicated verbatim).

    ``tagger`` is any callable text -> iterable of (word, flag);
    jieba.posseg.cut when jieba is importable (the reference's tagger),
    else the regex fallback above. Contract tests in
    tests/test_jieba_seam.py prove the jieba path the moment the lib
    appears."""
    if text is None:
        return []
    sw = stopwords if stopwords is not None else ()
    sw = sw if isinstance(sw, (set, frozenset)) else frozenset(sw)
    if tagger is None:
        if HAS_JIEBA:
            import jieba.posseg as _posseg

            tagger = lambda t: ((w.word, w.flag) for w in _posseg.cut(t))
        else:
            tagger = _fallback_tagger
    words = [w for w, flag in tagger(text) if not flag or flag[0] not in "uxw"]
    return [w for w in words if w.lower() not in sw or len(w.strip()) < 2]


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


def jvm_tokens_col(text_col, mode: str = "corpus", stopwords: Optional[frozenset] = None):
    """JVM-side tokenizer: byte-identical to the Python fallback (same
    explicit-ASCII-whitespace pattern) but pure Catalyst — whole-stage
    codegen, zero Python workers. This is the ingest hot path whenever jieba
    isn't the active segmenter: at local[N]=machine-cores, a Python UDF stage
    runs N JVM threads + N Python workers (2x oversubscription) and scales
    NEGATIVELY; this path removes Python from the scan entirely."""
    toks = F.regexp_extract_all(text_col, F.lit(TOKEN_PATTERN), 0)
    if mode == "query":
        return toks
    sw = sorted(stopwords or ())
    if sw:
        sw_arr = F.array(*[F.lit(w) for w in sw])
        # reference filter semantics (literal_similarity.py:412-413); regex
        # tokens contain no ASCII whitespace, so trim() is a no-op and the
        # emptiness test is only needed for exotic Unicode-space tokens
        return F.filter(
            toks,
            lambda t: (~F.array_contains(sw_arr, F.lower(F.trim(t))))
            & (F.length(F.trim(t)) > 0),
        )
    return toks


def choose_corpus_tokenizer(stopwords: Optional[frozenset], prefer: str = "auto"):
    """-> ('jvm', column_fn) or ('python', udf). 'auto' uses the JVM path
    unless jieba is installed (jieba segmentation != regex fallback)."""
    if prefer == "jvm" or (prefer == "auto" and not HAS_JIEBA):
        return "jvm", lambda col: jvm_tokens_col(col, "corpus", stopwords)
    udf = make_tokenizer_udf("corpus", stopwords)
    return "python", lambda col: udf(col)


def load_stopwords(path: str) -> frozenset:
    """Load a newline-delimited stopword file (reference utils/tfidf.py:17-24:
    each line stripped, added verbatim to a set). Missing file -> empty set."""
    import os

    if not path or not os.path.exists(path):
        return frozenset()
    with open(path, "r", encoding="utf-8") as f:
        return frozenset(line.strip() for line in f)
