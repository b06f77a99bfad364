"""BEIR-shaped IR-eval pipeline end-to-end (FIXTURES.md §4, reference
SearchDataLoader + evaluation.py flow): synthetic corpus.jsonl /
queries.jsonl / qrels TSV -> read_beir -> index -> search -> metrics."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from similarities_spark import evaluation
from similarities_spark.config import EngineConfig
from similarities_spark.index.build import BM25IndexBuilder
from similarities_spark.query.engine import BM25QueryEngine
from similarities_spark.sources.readers import read_beir


def make_beir_dir(tmp_path):
    rng = np.random.RandomState(5)
    vocab = [f"word{i}" for i in range(80)]
    docs = []
    for i in range(50):
        toks = list(rng.choice(vocab, size=20))
        toks.append(f"marker{i % 10}")  # each marker identifies 5 docs
        docs.append({"_id": f"d{i}", "title": f"title {i}", "text": " ".join(toks)})
    queries = [{"_id": f"q{m}", "text": f"marker{m}"} for m in range(5)]
    qrels = [
        (f"q{m}", f"d{i}", 1)
        for m in range(5)
        for i in range(50)
        if i % 10 == m
    ]
    d = tmp_path / "beir"
    (d / "qrels").mkdir(parents=True)
    with open(d / "corpus.jsonl", "w") as f:
        for row in docs:
            f.write(json.dumps(row) + "\n")
    with open(d / "queries.jsonl", "w") as f:
        for row in queries:
            f.write(json.dumps(row) + "\n")
    with open(d / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for q, c, s in qrels:
            f.write(f"{q}\t{c}\t{s}\n")
    return str(d)


def test_beir_pipeline_end_to_end(spark, tmp_path):
    beir_dir = make_beir_dir(tmp_path)
    corpus, queries, qrels = read_beir(spark, beir_dir)
    assert corpus.count() == 50 and queries.count() == 5
    assert qrels.count() == 25

    # corpus -> webtext shape -> index (corpus ids map to dense doc ids via
    # the url round-trip, like the documents-table adapter)
    web = corpus.select(
        F.concat(F.lit("beir://"), F.col("corpus_id")).alias("url"),
        F.to_timestamp(
            F.regexp_extract("corpus_id", r"(\d+)", 1).cast("long")
            + F.lit(1672531200)
        ).alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )
    cfg = EngineConfig(stopwords=frozenset(), num_term_buckets=4, num_salts=2)
    idx = BM25IndexBuilder(spark, cfg).build(
        web, str(tmp_path / "beir_idx"), input_desc="beir-synth"
    )
    assert idx.n_docs == 50

    qdf = queries.select(
        F.regexp_extract("query_id", r"(\d+)", 1).cast("long").alias("query_id"),
        "text",
    )
    hits = BM25QueryEngine(idx).search_df(qdf, topn=10)
    # map dense doc ids back to corpus ids for the qrels join
    docs_map = idx.docs().select(
        "doc_id", F.regexp_replace("url", "beir://", "").alias("corpus_id")
    )
    hits_c = (
        hits.join(docs_map, "doc_id")
        .select("query_id", "rank", "corpus_id")
        .withColumn("doc_id", F.col("corpus_id"))
    )
    qrels_k = qrels.select(
        F.regexp_extract("query_id", r"(\d+)", 1).cast("long").alias("query_id"),
        F.col("corpus_id").alias("doc_id"),
        "relevance",
    )
    # every query's 5 relevant marker docs contain the query's unique term;
    # the 5 relevant docs must dominate the top ranks
    mrr = evaluation.mrr_at_k(hits_c, qrels_k, ks=[10]).collect()[0]["mrr"]
    assert mrr == 1.0  # top hit is always a marker doc
    rec = evaluation.recall_cap_at_k(hits_c, qrels_k, ks=[5]).collect()[0][
        "recall_cap"
    ]
    assert rec == 1.0  # all 5 relevant docs in the top 5
    acc = evaluation.accuracy_at_k(hits_c, qrels_k, ks=[1]).collect()[0]["accuracy"]
    assert acc == 1.0


def test_qps_style_fixture(spark, tmp_path):
    """Shape of the reference QPS harness (tests/test_text_qps.py:19-31,
    :128-137): TSV sent1/sent2/label; corpus = col2, queries = col1 prefix."""
    import pandas as pd

    from similarities_spark.sources.synth import synth_webtext_pandas

    base = synth_webtext_pandas(n_docs=120, seed=21)
    texts = [t for t in base["text"] if t.strip()][:100]
    tsv = tmp_path / "sts.tsv"
    with open(tsv, "w") as f:
        for i, t in enumerate(texts):
            f.write(f"{texts[(i + 1) % len(texts)]}\t{t}\t{i % 6}\n")
    pdf = pd.read_csv(tsv, sep="\t", header=None, names=["s1", "s2", "label"])
    corpus = list(pdf["s2"])
    queries = list(pdf["s1"])[:20]

    cfg = EngineConfig(stopwords=frozenset(), num_term_buckets=4, num_salts=2)
    web = spark.createDataFrame(
        [
            (f"sts://{i:04d}", None, None, t, "en")
            for i, t in enumerate(corpus)
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp(F.lit(1672531200) + F.monotonically_increasing_id() * 0))
    # deterministic ts from url ordinal
    web = web.withColumn(
        "warc_ts",
        F.to_timestamp(
            F.regexp_extract("url", r"(\d+)", 1).cast("long") + F.lit(1672531200)
        ),
    )
    idx = BM25IndexBuilder(spark, cfg).build(
        web, str(tmp_path / "sts_idx"), input_desc="sts"
    )
    hits = BM25QueryEngine(idx).search(queries, topn=5)
    per_q = (
        hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert len(per_q) == 20
    assert all(r["n"] == 5 for r in per_q)


def test_ndcg_map_precision_recall_hand_computed(spark):
    """Hand-computed trec_eval semantics on a 2-query case with graded rels.

    q0: qrels {d1: rel 3, d2: rel 1, d9: rel 2}; ranking d1, d3, d2, d4, d5.
    q1: qrels {d7: rel 1};                       ranking d8, d7.
    """
    hits = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 3), (0, 3, 2), (0, 4, 4), (0, 5, 5),
         (1, 1, 8), (1, 2, 7)],
        "query_id long, rank long, doc_id long",
    )
    qrels = spark.createDataFrame(
        [(0, 1, 3), (0, 2, 1), (0, 9, 2), (1, 7, 1)],
        "query_id long, doc_id long, relevance long",
    )
    import math

    log2 = lambda x: math.log2(x)
    # --- nDCG@3: q0 DCG = 3/log2(2) + 1/log2(4); IDCG = 3/log2(2) +
    # 2/log2(3) + 1/log2(4); q1 DCG = 1/log2(3); IDCG = 1/log2(2)
    q0_dcg = 3 / log2(2) + 1 / log2(4)
    q0_idcg = 3 / log2(2) + 2 / log2(3) + 1 / log2(4)
    q1_dcg = 1 / log2(3)
    ndcg3 = (q0_dcg / q0_idcg + q1_dcg / 1.0) / 2
    got = {r["k"]: r["ndcg"] for r in evaluation.ndcg_at_k(hits, qrels, ks=[3, 5]).collect()}
    assert got[3] == pytest.approx(ndcg3, rel=1e-12)
    # nDCG@5 adds nothing for q0 (d4, d5 unjudged) or q1
    q0_idcg5 = q0_idcg
    ndcg5 = (q0_dcg / q0_idcg5 + q1_dcg) / 2
    assert got[5] == pytest.approx(ndcg5, rel=1e-12)

    # --- MAP@3: q0 hits at rank 1 (P=1) and rank 3 (P=2/3), R=3 ->
    # AP = (1 + 2/3)/3; q1 hit at rank 2 (P=1/2), R=1 -> AP = 1/2
    map3 = ((1 + 2 / 3) / 3 + 1 / 2) / 2
    gotm = {r["k"]: r["map"] for r in evaluation.map_at_k(hits, qrels, ks=[3]).collect()}
    assert gotm[3] == pytest.approx(map3, rel=1e-12)

    # --- P@3: q0 2/3, q1 1/3 -> mean 1/2 ; Recall@3: q0 2/3, q1 1 -> 5/6
    gotp = {r["k"]: r["precision"] for r in evaluation.precision_at_k(hits, qrels, ks=[3]).collect()}
    assert gotp[3] == pytest.approx(0.5, rel=1e-12)
    gotr = {r["k"]: r["recall"] for r in evaluation.recall_at_k(hits, qrels, ks=[3]).collect()}
    assert gotr[3] == pytest.approx((2 / 3 + 1) / 2, rel=1e-12)
