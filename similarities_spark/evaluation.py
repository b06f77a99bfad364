"""IR evaluation operators as DataFrame aggregations.

Reference analogs (semantics, not code — reference similarities/evaluation.py):
- mrr_at_k      <- evaluation.py:10-36   (mean reciprocal rank of first hit)
- recall_cap_at_k <- evaluation.py:39-62 (hits@k / min(k, n_relevant))
- accuracy_at_k <- evaluation.py:94-122  (any relevant doc in top-k)
- hole_at_k     <- evaluation.py:65-91   (top-k docs absent from annotations)
- ndcg_at_k / map_at_k / precision_at_k / recall_at_k
                <- evaluation.py:125-171 (the reference delegates these to
  pytrec_eval's ndcg_cut/map_cut/P/recall; reimplemented natively here with
  trec_eval semantics — linear gain rel/log2(rank+1) for (n)DCG, AP@k
  divided by the FULL relevant count R, means over the queries that have at
  least one positive qrel).

Inputs:
- hits : (query_id, rank, doc_id[, score]) — ranked retrieval output
- qrels: (query_id, doc_id, relevance)     — graded relevance (>0 = relevant)

All metrics return one row per k in ``ks`` with a double value — pure
groupBy/join/window aggregations, no Python. The only collects are
O(len(ks)) scalars.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


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


def ndcg_at_k(
    hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)
) -> DataFrame:
    """trec_eval ndcg_cut: DCG@k = sum(rel / log2(rank+1)) over ranked hits,
    IDCG@k from qrels sorted by (relevance desc, doc_id asc), per-query
    nDCG = DCG/IDCG, mean over queries with >=1 positive qrel."""
    rel = qrels.filter(F.col("relevance") > 0).select(
        "query_id", "doc_id", F.col("relevance").cast("double").alias("rel")
    )
    n_q = rel.select("query_id").distinct().count()
    gained = hits.join(rel, ["query_id", "doc_id"]).select(
        "query_id", "rank", (F.col("rel") / F.log2(F.col("rank") + 1)).alias("g")
    )
    iw = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = rel.withColumn("irank", F.row_number().over(iw)).select(
        "query_id",
        "irank",
        (F.col("rel") / F.log2(F.col("irank") + 1)).alias("ig"),
    )
    rows = []
    for k in ks:
        dcg = gained.filter(F.col("rank") <= k).groupBy("query_id").agg(
            F.sum("g").alias("dcg")
        )
        idcg = ideal.filter(F.col("irank") <= k).groupBy("query_id").agg(
            F.sum("ig").alias("idcg")
        )
        s = (
            idcg.join(dcg, "query_id", "left")
            .select(
                (F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")).alias("n")
            )
            .agg(F.sum("n").alias("s"))
            .collect()[0]["s"]
        )
        rows.append((int(k), float(s or 0.0) / n_q))
    return hits.sparkSession.createDataFrame(rows, "k int, ndcg double")


def map_at_k(
    hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)
) -> DataFrame:
    """trec_eval map_cut: AP@k = sum over relevant hits at rank r<=k of
    (#relevant in top-r / r), divided by the FULL relevant count R (not
    min(R, k)); mean over queries with >=1 positive qrel."""
    rel = qrels.filter(F.col("relevance") > 0).select("query_id", "doc_id")
    n_q = rel.select("query_id").distinct().count()
    n_rel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    matched = hits.join(rel, ["query_id", "doc_id"]).select("query_id", "rank")
    w = Window.partitionBy("query_id").orderBy("rank")
    prec = matched.withColumn(
        "p", F.row_number().over(w) / F.col("rank")
    )
    rows = []
    for k in ks:
        s = (
            prec.filter(F.col("rank") <= k)
            .groupBy("query_id")
            .agg(F.sum("p").alias("ap_num"))
            .join(n_rel, "query_id")
            .select((F.col("ap_num") / F.col("n_rel")).alias("ap"))
            .agg(F.sum("ap").alias("s"))
            .collect()[0]["s"]
        )
        rows.append((int(k), float(s or 0.0) / n_q))
    return hits.sparkSession.createDataFrame(rows, "k int, map double")


def precision_at_k(
    hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)
) -> DataFrame:
    """trec_eval P@k: #relevant in top-k / k, mean over judged queries."""
    rel = qrels.filter(F.col("relevance") > 0).select("query_id", "doc_id")
    n_q = rel.select("query_id").distinct().count()
    matched = hits.join(rel, ["query_id", "doc_id"]).select("query_id", "rank")
    rows = []
    for k in ks:
        s = matched.filter(F.col("rank") <= k).count()
        rows.append((int(k), float(s) / (k * n_q)))
    return hits.sparkSession.createDataFrame(rows, "k int, precision double")


def recall_at_k(
    hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)
) -> DataFrame:
    """trec_eval recall@k: #relevant in top-k / R, mean over judged queries."""
    rel = qrels.filter(F.col("relevance") > 0).select("query_id", "doc_id")
    n_q = rel.select("query_id").distinct().count()
    n_rel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    matched = hits.join(rel, ["query_id", "doc_id"]).select("query_id", "rank")
    rows = []
    for k in ks:
        s = (
            matched.filter(F.col("rank") <= k)
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
            .join(n_rel, "query_id")
            .select((F.col("n_hit") / F.col("n_rel")).alias("r"))
            .agg(F.sum("r").alias("s"))
            .collect()[0]["s"]
        )
        rows.append((int(k), float(s or 0.0) / n_q))
    return hits.sparkSession.createDataFrame(rows, "k int, recall double")


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
