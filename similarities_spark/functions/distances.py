"""Pairwise literal-similarity metrics (reference utils/distance.py family),
re-expressed as Catalyst column expressions — no Python in the hot path.

Reference analogs (semantics, not code):
- edit_distance        <- distance.py:81-90   (Levenshtein)
- jaccard tokens/chars <- distance.py:129-134 (set |A∩B|/|A∪B|)
- samechars ratio      <- literal_similarity.py:928-949 (char-set overlap)
- hamming on simhash   <- literal_similarity.py:119-125
- RRF ensemble fusion  <- ensemble_similarity.py:156-161
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from similarities_spark.functions.textops import tokens_col


def edit_distance(a: Column, b: Column) -> Column:
    return F.levenshtein(a, b)


def edit_similarity(a: Column, b: Column) -> Column:
    """1 - lev/max_len — the reference's normalized edit similarity
    (distance.py:81-90 shape)."""
    return F.round(
        1.0
        - F.levenshtein(a, b)
        / F.greatest(F.length(a), F.length(b), F.lit(1)),
        6,
    )


def token_jaccard(a: Column, b: Column) -> Column:
    ta = F.array_distinct(tokens_col(a))
    tb = F.array_distinct(tokens_col(b))
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return F.round(inter / F.greatest(union, F.lit(1)), 6)


def char_jaccard(a: Column, b: Column) -> Column:
    """SameChars-style similarity: distinct-character set overlap."""
    ca = F.array_distinct(F.split(a, ""))
    cb = F.array_distinct(F.split(b, ""))
    inter = F.size(F.array_intersect(ca, cb))
    union = F.size(F.array_union(ca, cb))
    return F.round(inter / F.greatest(union, F.lit(1)), 6)


# ---------------------------------------------------------------------------
# vector distance family (reference utils/distance.py:56-104) — pure Catalyst
# higher-order-function expressions over array<double> columns; whole-stage
# codegen, no Python workers, no densification.

_ZERO_BIT = 1e-9  # reference utils/distance.py:11


def _sum_arr(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def euclidean(a: Column, b: Column, normalize: bool = False) -> Column:
    """sqrt(sum((a-b)^2)); normalize=True -> 1/(1+d)
    (reference distance.py:56-60)."""
    d = F.sqrt(_sum_arr(F.zip_with(a, b, lambda x, y: (x - y) * (x - y))))
    return 1.0 / (1.0 + d) if normalize else d


def manhattan(a: Column, b: Column) -> Column:
    """sum(|a-b|) (reference distance.py:63-64)."""
    return _sum_arr(F.zip_with(a, b, lambda x, y: F.abs(x - y)))


def chebyshev(a: Column, b: Column) -> Column:
    """max(|a-b|) (reference distance.py:67-68)."""
    return F.array_max(F.zip_with(a, b, lambda x, y: F.abs(x - y)))


def minkowski(a: Column, b: Column, p: float = 2.0) -> Column:
    """(sum(|a-b|^p))^(1/p). The reference's minkowski_distance
    (distance.py:71-72) hardcodes the p=2 form; p=2 here is numerically
    identical, other p generalize."""
    if p == 2.0:
        return euclidean(a, b)
    s = _sum_arr(F.zip_with(a, b, lambda x, y: F.pow(F.abs(x - y), F.lit(p))))
    return F.pow(s, F.lit(1.0 / p))


def pearson(a: Column, b: Column) -> Column:
    """Pearson correlation coefficient (reference distance.py:93-96,
    np.corrcoef[0][1]) via the single-pass moment form."""
    n = F.size(a).cast("double")
    sx = _sum_arr(a)
    sy = _sum_arr(b)
    sxx = _sum_arr(F.zip_with(a, a, lambda x, y: x * y))
    syy = _sum_arr(F.zip_with(b, b, lambda x, y: x * y))
    sxy = _sum_arr(F.zip_with(a, b, lambda x, y: x * y))
    num = n * sxy - sx * sy
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return num / den


def vector_hamming(a: Column, b: Column, normalize: bool = False) -> Column:
    """Elementwise disagreement count over equal-length arrays
    (reference distance.py:31-36)."""
    d = _sum_arr(
        F.zip_with(a, b, lambda x, y: F.when(x != y, 1.0).otherwise(0.0))
    )
    return d / F.size(a).cast("double") if normalize else d


def max_min_normalize(arr: Column) -> Column:
    """(x - min) / (max - min + 1e-9) elementwise
    (reference distance.py:175-181)."""
    lo, hi = F.array_min(arr), F.array_max(arr)
    return F.transform(arr, lambda x: (x - lo) / (hi - lo + F.lit(_ZERO_BIT)))


def z_score(arr: Column) -> Column:
    """(x - mean) / std elementwise, population std (np.std ddof=0,
    reference distance.py:184-195)."""
    n = F.size(arr).cast("double")
    mean = _sum_arr(arr) / n
    var = _sum_arr(F.transform(arr, lambda x: (x - mean) * (x - mean))) / n
    return F.transform(arr, lambda x: (x - mean) / F.sqrt(var))


def rrf_fuse(
    rankings: list[DataFrame],
    weights: list[float] | None = None,
    c: int = 60,
    k: int | None = None,
) -> DataFrame:
    """Weighted Reciprocal Rank Fusion across ranked hit lists
    (score = sum weight/(rank + c), reference ensemble_similarity.py:156-161).

    Each input: (query_id, doc_id, rank). Output: (query_id, doc_id,
    rrf_score) ranked desc, ties by doc_id, optional top-k cut.
    """
    from pyspark.sql import Window

    weights = weights or [1.0] * len(rankings)
    parts = [
        r.select(
            "query_id",
            "doc_id",
            (F.lit(w) / (F.col("rank") + F.lit(c))).alias("part"),
        )
        for r, w in zip(rankings, weights)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("part"), 9).alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    fused = fused.withColumn("rank", F.row_number().over(w))
    if k is not None:
        fused = fused.filter(F.col("rank") <= k)
    return fused.select("query_id", "rank", "doc_id", "rrf_score")
