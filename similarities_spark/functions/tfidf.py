"""TFIDF similarity, sparse end-to-end (reference TfidfSimilarity analog).

The reference builds a DENSE vocab-length vector per text over jieba's
pre-baked IDF table (reference utils/tfidf.py:63-71) and does torch cosine
(literal_similarity.py:280-293). Distributed, densifying the vocab is the
cardinal sin — this keeps everything as (id, term, weight) triples:

  tfidf weight = tf * idf,  idf = ln((N+1)/(df+1)) + 1   (smooth variant)
  cosine(a, b) = sum_t w_a(t) w_b(t) / (||a|| ||b||)     via term equi-join

most_similar: queries x corpus cosine via a single sparse join on term —
the same shape as the BM25 query path, fully Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from similarities_spark.functions.textops import tokens_col


def tfidf_vectors(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, term, w, norm) sparse weights with per-doc L2 norms."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.count()
    df_tbl = tf.groupBy("term").agg(F.countDistinct("id").alias("df"))
    idf = df_tbl.withColumn(
        "idf", F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    )
    w = tf.join(idf.select("term", "idf"), "term").withColumn(
        "w", F.col("tf") * F.col("idf")
    )
    norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    return w.join(norms, "id").select("id", "term", "w", "norm")


def tfidf_most_similar(
    corpus_vecs: DataFrame, query_vecs: DataFrame, topn: int = 10
) -> DataFrame:
    """Sparse cosine top-n: equi-join on term, groupBy pair, window top-k."""
    c = corpus_vecs.select(
        F.col("id").alias("doc_id"),
        "term",
        F.col("w").alias("wc"),
        F.col("norm").alias("nc"),
    )
    q = query_vecs.select(
        F.col("id").alias("query_id"),
        "term",
        F.col("w").alias("wq"),
        F.col("norm").alias("nq"),
    )
    dots = (
        c.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            (F.sum(F.col("wc") * F.col("wq")) / (F.first("nc") * F.first("nq"))).alias(
                "cosine"
            )
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    return (
        dots.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topn)
        .select("query_id", "rank", "doc_id", F.round("cosine", 6).alias("cosine"))
    )
