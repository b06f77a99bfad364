"""End-to-end IR quality gate (VERDICT r4 'Next round' #8).

All eval metrics are DuckDB-oracled on small fixtures, and every BM25
component is parity-tested — but a scorer/tokenizer change could still
degrade RANKING QUALITY while staying perfectly self-consistent. This
gate runs the full production pipeline (BEIR loader -> index build ->
search_df -> evaluation) over a deterministic graded-relevance corpus
LARGE enough that metrics sit strictly inside (0, 1), and pins the exact
values as goldens. Any change to tokenization, BM25 math, ranking, or
tie-breaks moves at least one pinned metric.

Corpus design: each query names a 2-term topic; docs containing both
terms are relevance 2, exactly-one-term docs are relevance 1, the rest 0.
BM25 mostly ranks both-term docs first, but tf/doc-length noise keeps
NDCG@10 below 1 — the gate is sensitive in both directions.

GOLDENS pin engine behavior, not ground truth: if an INTENTIONAL
semantics change shifts them, re-run with UPDATE_QUALITY_GOLDENS=1 and
commit the new values with the change that caused them.
"""

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

N_DOCS = 2000
N_QUERIES = 100
N_TOPICS = 50  # 2 queries per topic pair-slot; topics share a vocab pool


def make_graded_beir_dir(tmp_path) -> str:
    rng = np.random.RandomState(17)
    filler = [f"w{i:03d}" for i in range(300)]
    topics = [(f"alpha{t:02d}", f"beta{t:02d}") for t in range(N_TOPICS)]

    docs = []
    rels = {}  # (query_ordinal, doc_ordinal) -> relevance
    for i in range(N_DOCS):
        n_fill = int(rng.randint(20, 60))
        toks = list(rng.choice(filler, size=n_fill))
        t = int(rng.randint(0, N_TOPICS))
        draw = rng.rand()
        a, b = topics[t]
        if draw < 0.05:  # both topic terms -> relevance 2
            # 1-3 occurrences each: tf variation keeps ranking non-trivial
            toks += [a] * int(rng.randint(1, 4)) + [b] * int(rng.randint(1, 4))
            rel = 2
        elif draw < 0.20:  # exactly one topic term, judged relevant half
            # the time — the unjudged half are DISTRACTORS (term-matching
            # docs with relevance 0), which is what keeps the metrics off
            # their ceiling: BM25 cannot tell them apart, so every ranking
            # decision among term-matchers moves NDCG/P@10
            toks += [a if rng.rand() < 0.5 else b] * int(rng.randint(1, 4))
            rel = 1 if rng.rand() < 0.5 else 0
        else:
            rel = 0
        if rel:
            for qo in (2 * t, 2 * t + 1):
                if qo < N_QUERIES:
                    rels[(qo, i)] = rel
        rng.shuffle(toks)
        docs.append(
            {"_id": f"d{i}", "title": f"doc {i}", "text": " ".join(toks)}
        )

    queries = []
    for qo in range(N_QUERIES):
        a, b = topics[qo // 2]
        # even ordinal: bare topic pair; odd: pair plus one filler term
        # (a realistic query with a non-discriminative token)
        text = f"{a} {b}" if qo % 2 == 0 else f"{a} {b} {filler[qo]}"
        queries.append({"_id": f"q{qo}", "text": text})

    d = tmp_path / "beir_quality"
    (d / "qrels").mkdir(parents=True)
    with open(d / "corpus.jsonl", "w") as f:
        for row in docs:
            f.write(json.dumps(row) + "\n")
    with open(d / "queries.jsonl", "w") as f:
        for row in queries:
            f.write(json.dumps(row) + "\n")
    with open(d / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for (qo, i), rel in sorted(rels.items()):
            f.write(f"q{qo}\td{i}\t{rel}\n")
    return str(d)


# Pinned goldens (UPDATE_QUALITY_GOLDENS=1 prints fresh values).
# Captured at r5 over the deterministic corpus above; exact float64
# reproducibility is expected (regex tokenizer, C-libm idf, stable
# doc_id tie-breaks, order-free aggregation in the eval layer).
GOLDENS = {
    "ndcg@10": 0.9179510987288098,
    "map@10": 0.8103434656757059,
    "mrr@10": 0.9496598639455782,
    "p@10": 0.48673469387755103,
    "recall@10": 0.9773522962298472,
    "recall_cap@10": 0.9820618723679948,
}


def test_ir_quality_goldens(spark, tmp_path):
    beir_dir = make_graded_beir_dir(tmp_path)
    corpus, queries, qrels = read_beir(spark, beir_dir)

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
    cfg = EngineConfig(stopwords=frozenset(), num_term_buckets=8, num_salts=4)
    idx = BM25IndexBuilder(spark, cfg).build(
        web, str(tmp_path / "q_idx"), input_desc="beir-quality"
    )
    assert idx.n_docs == N_DOCS

    qdf = queries.select(
        F.regexp_extract("query_id", r"(\d+)", 1).cast("long").alias("query_id"),
        "text",
    )
    hits = BM25QueryEngine(idx).search_df(qdf, topn=10)
    docs_map = idx.docs().select(
        "doc_id", F.regexp_replace("url", "beir://", "").alias("corpus_id")
    )
    hits_c = (
        hits.join(docs_map, "doc_id")
        .select("query_id", "rank", F.col("corpus_id").alias("doc_id"))
    )
    qrels_k = qrels.select(
        F.regexp_extract("query_id", r"(\d+)", 1).cast("long").alias("query_id"),
        F.col("corpus_id").alias("doc_id"),
        "relevance",
    )

    got = {
        "ndcg@10": evaluation.ndcg_at_k(hits_c, qrels_k, ks=[10]).collect()[0]["ndcg"],
        "map@10": evaluation.map_at_k(hits_c, qrels_k, ks=[10]).collect()[0]["map"],
        "mrr@10": evaluation.mrr_at_k(hits_c, qrels_k, ks=[10]).collect()[0]["mrr"],
        "p@10": evaluation.precision_at_k(hits_c, qrels_k, ks=[10]).collect()[0]["precision"],
        "recall@10": evaluation.recall_at_k(hits_c, qrels_k, ks=[10]).collect()[0]["recall"],
        "recall_cap@10": evaluation.recall_cap_at_k(hits_c, qrels_k, ks=[10]).collect()[0]["recall_cap"],
    }
    if os.environ.get("UPDATE_QUALITY_GOLDENS"):
        print("\nGOLDENS = " + json.dumps(got, indent=4))
    # sanity: the corpus is hard enough that nothing saturates
    assert 0.3 < got["ndcg@10"] < 1.0
    assert 0.2 < got["map@10"] < 1.0
    for name, want in GOLDENS.items():
        assert got[name] == pytest.approx(want, abs=1e-9), (
            f"{name}: got {got[name]!r}, pinned {want!r} — ranking quality "
            "drifted; if intentional, UPDATE_QUALITY_GOLDENS=1 and re-pin"
        )
