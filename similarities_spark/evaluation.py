"""IR evaluation operators as DataFrame aggregations.

Reference analogs (semantics, not code — reference similarities/evaluation.py):
- mrr_at_k      <- evaluation.py:10-36   (mean reciprocal rank of first hit)
- recall_cap_at_k <- evaluation.py:39-62 (hits@k / min(k, n_relevant))
- accuracy_at_k <- evaluation.py:94-122  (any relevant doc in top-k)
- hole_at_k     <- evaluation.py:65-91   (top-k docs absent from annotations)

Inputs:
- hits : (query_id, rank, doc_id[, score]) — ranked retrieval output
- qrels: (query_id, doc_id, relevance)     — graded relevance (>0 = relevant)

All metrics return one row per k in ``ks`` with a double value — pure
groupBy/join aggregations, no Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def _rel(qrels: DataFrame) -> DataFrame:
    return qrels.filter(F.col("relevance") > 0).select("query_id", "doc_id")


def mrr_at_k(hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)) -> DataFrame:
    rel = _rel(qrels)
    first = (
        hits.join(rel, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.min("rank").alias("first_rank"))
    )
    n_q = qrels.select("query_id").distinct().count()
    rows = []
    for k in ks:
        rr = first.select(
            F.sum(
                F.when(F.col("first_rank") <= k, 1.0 / F.col("first_rank")).otherwise(0.0)
            ).alias("s")
        ).collect()[0]["s"]
        rows.append((int(k), float(rr or 0.0) / n_q))
    return hits.sparkSession.createDataFrame(rows, "k int, mrr double")


def recall_cap_at_k(
    hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)
) -> DataFrame:
    rel = _rel(qrels)
    n_rel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    joined = hits.join(rel, ["query_id", "doc_id"]).select("query_id", "rank")
    n_q = qrels.select("query_id").distinct().count()
    rows = []
    for k in ks:
        per_q = (
            joined.filter(F.col("rank") <= k)
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
            .join(n_rel, "query_id", "right")
            .select(
                (
                    F.coalesce(F.col("n_hit"), F.lit(0))
                    / F.least(F.lit(k), F.col("n_rel"))
                ).alias("r")
            )
        )
        s = per_q.agg(F.sum("r").alias("s")).collect()[0]["s"]
        rows.append((int(k), float(s or 0.0) / n_q))
    return hits.sparkSession.createDataFrame(rows, "k int, recall_cap double")


def accuracy_at_k(
    hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)
) -> DataFrame:
    rel = _rel(qrels)
    joined = hits.join(rel, ["query_id", "doc_id"]).select("query_id", "rank")
    n_q = qrels.select("query_id").distinct().count()
    rows = []
    for k in ks:
        n_hit = (
            joined.filter(F.col("rank") <= k).select("query_id").distinct().count()
        )
        rows.append((int(k), n_hit / n_q))
    return hits.sparkSession.createDataFrame(rows, "k int, accuracy double")


def hole_at_k(hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)) -> DataFrame:
    """Fraction of top-k results with NO annotation at all (unjudged)."""
    judged = qrels.select("query_id", "doc_id").distinct()
    n_q = qrels.select("query_id").distinct().count()
    rows = []
    for k in ks:
        topk = hits.filter(F.col("rank") <= k)
        unjudged = topk.join(judged, ["query_id", "doc_id"], "left_anti").count()
        rows.append((int(k), unjudged / (n_q * k)))
    return hits.sparkSession.createDataFrame(rows, "k int, hole double")
