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

Every metric computes ALL cutoffs in ONE aggregation: the ks ride in as an
exploded literal array (each hit row fans out to the cutoffs it satisfies),
so one call = one Spark job regardless of len(ks) — no per-k driver loop.
The query-count denominator joins in as a broadcast scalar subtree; the
result stays a DataFrame (one row per k, schema "k int, <metric> double")
and nothing is collected."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def _rel(qrels: DataFrame) -> DataFrame:
    return qrels.filter(F.col("relevance") > 0).select("query_id", "doc_id")


def _ks_arr(ks: Sequence[int]):
    return F.array(*[F.lit(int(k)) for k in ks])


def _ks_frame(df: DataFrame, ks: Sequence[int]) -> DataFrame:
    return df.sparkSession.createDataFrame(
        [(int(k),) for k in ks], "k int"
    )


def _n_queries(qrels: DataFrame, positive_only: bool) -> DataFrame:
    """Scalar (1-row) denominator subtree, cross-joined broadcast."""
    src = _rel(qrels) if positive_only else qrels
    return src.agg(F.countDistinct("query_id").alias("n_q"))


def _finish(
    per_k: DataFrame, ks_df: DataFrame, n_q: DataFrame, out_col: str
) -> DataFrame:
    """Left-join from the ks frame (every requested k gets a row even with
    zero matches), divide by the broadcast query count, fix column order."""
    return (
        ks_df.join(per_k, "k", "left")
        .crossJoin(F.broadcast(n_q))
        .select(
            "k",
            (F.coalesce(F.col("s"), F.lit(0.0)) / F.col("n_q")).alias(out_col),
        )
    )


def mrr_at_k(hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)) -> DataFrame:
    rel = _rel(qrels)
    first = (
        hits.join(rel, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.min("rank").alias("first_rank"))
    )
    per_k = (
        first.select("first_rank", F.explode(_ks_arr(ks)).alias("k"))
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    F.col("first_rank") <= F.col("k"), 1.0 / F.col("first_rank")
                ).otherwise(0.0)
            ).alias("s")
        )
    )
    return _finish(per_k, _ks_frame(hits, ks), _n_queries(qrels, False), "mrr")


def recall_cap_at_k(
    hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)
) -> DataFrame:
    rel = _rel(qrels)
    n_rel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    hit_counts = (
        hits.join(rel, ["query_id", "doc_id"])
        .select("query_id", F.explode(_ks_arr(ks)).alias("k"), "rank")
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    # right side = every (judged query, k): queries with zero hits at k
    # still contribute a 0 term to the mean
    q_ks = n_rel.select("query_id", "n_rel", F.explode(_ks_arr(ks)).alias("k"))
    per_k = (
        q_ks.join(hit_counts, ["query_id", "k"], "left")
        .groupBy("k")
        .agg(
            F.sum(
                F.coalesce(F.col("n_hit"), F.lit(0))
                / F.least(F.col("k"), F.col("n_rel"))
            ).alias("s")
        )
    )
    return _finish(
        per_k, _ks_frame(hits, ks), _n_queries(qrels, False), "recall_cap"
    )


def accuracy_at_k(
    hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)
) -> DataFrame:
    rel = _rel(qrels)
    per_k = (
        hits.join(rel, ["query_id", "doc_id"])
        .select("query_id", F.explode(_ks_arr(ks)).alias("k"), "rank")
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "k")
        .distinct()
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("double").alias("s"))
    )
    return _finish(
        per_k, _ks_frame(hits, ks), _n_queries(qrels, False), "accuracy"
    )


def ndcg_at_k(
    hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)
) -> DataFrame:
    """trec_eval ndcg_cut: DCG@k = sum(rel / log2(rank+1)) over ranked hits,
    IDCG@k from qrels sorted by (relevance desc, doc_id asc), per-query
    nDCG = DCG/IDCG, mean over queries with >=1 positive qrel."""
    rel = qrels.filter(F.col("relevance") > 0).select(
        "query_id", "doc_id", F.col("relevance").cast("double").alias("rel")
    )
    dcg = (
        hits.join(rel, ["query_id", "doc_id"])
        .select(
            "query_id",
            F.explode(_ks_arr(ks)).alias("k"),
            "rank",
            (F.col("rel") / F.log2(F.col("rank") + 1)).alias("g"),
        )
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(F.sum("g").alias("dcg"))
    )
    iw = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    idcg = (
        rel.withColumn("irank", F.row_number().over(iw))
        .select(
            "query_id",
            F.explode(_ks_arr(ks)).alias("k"),
            "irank",
            (F.col("rel") / F.log2(F.col("irank") + 1)).alias("ig"),
        )
        .filter(F.col("irank") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(F.sum("ig").alias("idcg"))
    )
    per_k = (
        idcg.join(dcg, ["query_id", "k"], "left")
        .groupBy("k")
        .agg(
            F.sum(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")
            ).alias("s")
        )
    )
    return _finish(per_k, _ks_frame(hits, ks), _n_queries(qrels, True), "ndcg")


def map_at_k(
    hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)
) -> DataFrame:
    """trec_eval map_cut: AP@k = sum over relevant hits at rank r<=k of
    (#relevant in top-r / r), divided by the FULL relevant count R (not
    min(R, k)); mean over queries with >=1 positive qrel."""
    rel = _rel(qrels)
    n_rel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    w = Window.partitionBy("query_id").orderBy("rank")
    prec = (
        hits.join(rel, ["query_id", "doc_id"])
        .select("query_id", "rank")
        .withColumn("p", F.row_number().over(w) / F.col("rank"))
    )
    per_k = (
        prec.select("query_id", F.explode(_ks_arr(ks)).alias("k"), "rank", "p")
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(F.sum("p").alias("ap_num"))
        .join(n_rel, "query_id")
        .groupBy("k")
        .agg(F.sum(F.col("ap_num") / F.col("n_rel")).alias("s"))
    )
    return _finish(per_k, _ks_frame(hits, ks), _n_queries(qrels, True), "map")


def precision_at_k(
    hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)
) -> DataFrame:
    """trec_eval P@k: #relevant in top-k / k, mean over judged queries."""
    rel = _rel(qrels)
    per_k = (
        hits.join(rel, ["query_id", "doc_id"])
        .select(F.explode(_ks_arr(ks)).alias("k"), "rank")
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("k")
        .agg((F.count(F.lit(1)) / F.col("k")).alias("s"))
    )
    return _finish(
        per_k, _ks_frame(hits, ks), _n_queries(qrels, True), "precision"
    )


def recall_at_k(
    hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)
) -> DataFrame:
    """trec_eval recall@k: #relevant in top-k / R, mean over judged queries."""
    rel = _rel(qrels)
    n_rel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    per_k = (
        hits.join(rel, ["query_id", "doc_id"])
        .select("query_id", F.explode(_ks_arr(ks)).alias("k"), "rank")
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .join(n_rel, "query_id")
        .groupBy("k")
        .agg(F.sum(F.col("n_hit") / F.col("n_rel")).alias("s"))
    )
    return _finish(per_k, _ks_frame(hits, ks), _n_queries(qrels, True), "recall")


def hole_at_k(hits: DataFrame, qrels: DataFrame, ks: Sequence[int] = (10,)) -> DataFrame:
    """Fraction of top-k results with NO annotation at all (unjudged)."""
    judged = qrels.select("query_id", "doc_id").distinct()
    per_k = (
        hits.join(judged, ["query_id", "doc_id"], "left_anti")
        .select(F.explode(_ks_arr(ks)).alias("k"), "rank")
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("k")
        .agg((F.count(F.lit(1)) / F.col("k")).alias("s"))
    )
    return _finish(per_k, _ks_frame(hits, ks), _n_queries(qrels, False), "hole")
