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
