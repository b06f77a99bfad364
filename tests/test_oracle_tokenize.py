"""Tokenizer semantics + vendored oracle sanity (SURVEY §5.1-5.2)."""

import math

import numpy as np

from similarities_spark.oracle import BM25Oracle
from similarities_spark.tokenize import tokenize_text


def test_corpus_mode_filters_stopwords_and_empties():
    sw = frozenset({"the", "of"})
    toks = tokenize_text("The cat of  doom", mode="corpus", stopwords=sw)
    # stopword match is case-insensitive on the stripped token (reference
    # literal_similarity.py:412-413) but surviving tokens keep their case
    assert toks == ["cat", "doom"]


def test_query_mode_keeps_everything():
    sw = frozenset({"the"})
    toks = tokenize_text("the the cat", mode="query", stopwords=sw)
    assert toks.count("the") == 2 and "cat" in toks


def test_cjk_fallback_segmentation_deterministic():
    t1 = tokenize_text("刘若英是演员abc 123", mode="query")
    t2 = tokenize_text("刘若英是演员abc 123", mode="query")
    assert t1 == t2
    assert "abc" in t1 and "123" in t1


def test_oracle_idf_floor_semantics():
    # 3 docs; term 'a' in all 3 -> negative idf -> floored to eps*average_idf
    corpus = [["a", "b"], ["a", "c"], ["a", "d"]]
    o = BM25Oracle(corpus)
    raw_a = math.log(3 - 3 + 0.5) - math.log(3 + 0.5)
    assert raw_a < 0
    raw_b = math.log(3 - 1 + 0.5) - math.log(1 + 0.5)
    avg = (raw_a + 3 * raw_b) / 4
    assert o.idf["a"] == 0.25 * avg
    assert o.idf["b"] == raw_b


def test_oracle_duplicate_query_tokens_scored_per_occurrence():
    corpus = [["x", "y"], ["y", "z"]]
    o = BM25Oracle(corpus)
    s1 = o.get_scores(["x"])
    s2 = o.get_scores(["x", "x"])
    assert np.allclose(s2, 2 * s1)


def test_oracle_ranking_stable_ties_by_doc_id():
    # identical docs -> identical scores -> ascending doc_id order
    corpus = [["q", "w"], ["q", "w"], ["q", "w"]]
    o = BM25Oracle(corpus)
    top = o.most_similar(["q"], topn=3)
    assert [d for d, _ in top] == [0, 1, 2]


def test_oracle_zero_score_padding_included():
    corpus = [["a"], ["b"], ["c"], ["d"]]
    o = BM25Oracle(corpus)
    top = o.most_similar(["a"], topn=10)
    assert len(top) == 4  # all docs rankable, reference test_literalsim.py:116-118
    assert top[0][0] == 0 and top[0][1] > 0
    assert [d for d, _ in top[1:]] == [1, 2, 3]
    assert all(s == 0.0 for _, s in top[1:])
