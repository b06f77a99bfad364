"""Sequence-matching similarities (reference SequenceMatcherSimilarity /
longest-common-substring family, utils/distance.py:115-126).

longest_match_size is an inherently per-pair dynamic program — the one
operator family where a vectorized Arrow UDF is the right tool (no
relational decomposition exists). The UDF processes whole Arrow batches of
pairs; the quadratic DP runs in difflib's C-accelerated SequenceMatcher.

- lcs_ratio(a, b)  = longest common substring length / min(len(a), len(b))
  (the reference's match_ratio shape, distance.py:121-126)
- samechars handled in functions/distances.char_jaccard (set overlap).
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType


@F.pandas_udf(IntegerType())
def longest_match_size(a: pd.Series, b: pd.Series) -> pd.Series:
    def one(x, y):
        if x is None or y is None or not x or not y:
            return 0
        m = SequenceMatcher(None, x, y).find_longest_match(0, len(x), 0, len(y))
        return int(m.size)

    return pd.Series([one(x, y) for x, y in zip(a, b)])


@F.pandas_udf(DoubleType())
def lcs_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
    def one(x, y):
        if x is None or y is None or not x or not y:
            return 0.0
        m = SequenceMatcher(None, x, y).find_longest_match(0, len(x), 0, len(y))
        return round(m.size / min(len(x), len(y)), 6)

    return pd.Series([one(x, y) for x, y in zip(a, b)])


def num_of_common_sub_str(a, b):
    """Longest-common-substring length as a Catalyst-free alias of
    longest_match_size (the reference implements the same quantity twice:
    utils/distance.py:113-119 longest_match_size via SequenceMatcher and
    :137-155 num_of_common_sub_str via an explicit DP — both return the max
    contiguous match length)."""
    return longest_match_size(a, b)


def is_str_match(a, b, threshold: float = 1.0):
    """Column predicate: strings match at ``threshold`` (reference
    utils/distance.py:107-112). threshold=1.0 -> exact equality; otherwise
    normalized edit similarity 1 - lev/max_len >= threshold, expressed as a
    pure Catalyst column (the reference computes the same normalized
    Levenshtein ratio via the C Levenshtein package, distance.py:81-90)."""
    assert 0.0 <= threshold <= 1.0, "Wrong threshold."
    if float(threshold) == 1.0:
        return a == b
    sim = 1.0 - F.levenshtein(a, b) / F.greatest(
        F.length(a), F.length(b), F.lit(1)
    )
    return sim >= F.lit(threshold)
