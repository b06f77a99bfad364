"""jieba-seam contract tests (skipped-not-absent while the container lacks
jieba): the moment the library appears, the Chinese segmentation path is
proven without any other change.

Two layers:
1. vendored goldens pin jieba's own published behavior (the segmentation
   examples from jieba's README — public knowledge; accurate mode, HMM on,
   exactly the reference's call shape, literal_similarity.py:411) so a
   version drift in jieba surfaces as a failing golden, and
2. UDF-vs-library parity proves our Arrow tokenizer wiring (corpus-mode
   stopword/empty filter, query-mode passthrough) reproduces jieba.lcut
   token-for-token end-to-end through a real Spark plan.
"""

import pytest

from similarities_spark.tokenize import HAS_JIEBA, make_tokenizer_udf, tokenize_text

jieba_required = pytest.mark.skipif(
    not HAS_JIEBA, reason="jieba not installed in this container"
)

# (text, jieba.lcut accurate-mode + HMM expected tokens) — from jieba's
# README usage examples (public domain examples of the library's output)
GOLDENS = [
    ("我来到北京清华大学", ["我", "来到", "北京", "清华大学"]),
    ("他来到了网易杭研大厦", ["他", "来到", "了", "网易", "杭研", "大厦"]),
    (
        "小明硕士毕业于中国科学院计算所",
        ["小明", "硕士", "毕业", "于", "中国科学院", "计算所"],
    ),
]


@jieba_required
def test_jieba_goldens_pin_version_behavior():
    import jieba

    for text, want in GOLDENS:
        assert jieba.lcut(text) == want, text


@jieba_required
def test_tokenize_text_uses_jieba_verbatim():
    for text, want in GOLDENS:
        # query mode: raw jieba.lcut output, nothing dropped
        assert tokenize_text(text, mode="query") == want
        # corpus mode without stopwords: only empty/whitespace tokens drop,
        # and these examples contain none
        assert tokenize_text(text, mode="corpus") == want


@jieba_required
def test_corpus_mode_stopword_filter_over_jieba_tokens():
    text, toks = GOLDENS[1]  # contains the particle 了
    got = tokenize_text(text, mode="corpus", stopwords=frozenset({"了"}))
    assert got == [t for t in toks if t != "了"]


def test_tfidf_pos_filter_math_with_fake_tagger():
    """The reference's TFIDF filter (utils/tfidf.py:63-65) with a pluggable
    tagger — always runnable: flag-first-char u/x/w drop + the
    keep-if-len<2 stopword quirk."""
    from similarities_spark.tokenize import tokenize_tfidf_text

    def tagger(_):
        return [
            ("结婚", "v"), ("的", "uj"), ("和", "c"), ("，", "x"),
            ("尚未", "d"), ("（", "w"), ("a", "eng"), ("the", "eng"),
        ]

    got = tokenize_tfidf_text(
        "ignored", stopwords={"和", "the", "a"}, tagger=tagger
    )
    # 的(uj), ，(x), （(w) drop by POS; 和/a survive the stopword filter
    # via len<2; the (len 3, stopword) drops
    assert got == ["结婚", "和", "尚未", "a"]


def test_tfidf_pos_filter_fallback_tagger_drops_punct():
    from similarities_spark.tokenize import HAS_JIEBA, tokenize_tfidf_text

    if HAS_JIEBA:
        pytest.skip("fallback tagger only active without jieba")
    got = tokenize_tfidf_text("hello , world !! ok", stopwords={"ok"})
    assert got == ["hello", "world"]


@jieba_required
def test_tfidf_pos_filter_jieba_golden():
    """jieba.posseg README example: 我爱北京天安门 -> 我/r 爱/v 北京/ns
    天安门/ns — nothing carries a u/x/w flag, so everything survives the
    POS stage; '我' (len 1) survives even as a stopword (the quirk)."""
    from similarities_spark.tokenize import tokenize_tfidf_text

    assert tokenize_tfidf_text("我爱北京天安门") == ["我", "爱", "北京", "天安门"]
    assert tokenize_tfidf_text("我爱北京天安门", stopwords={"我"}) == [
        "我", "爱", "北京", "天安门",
    ]


@jieba_required
def test_spark_udf_parity_with_jieba(spark):
    import jieba

    rows = [(i, t) for i, (t, _) in enumerate(GOLDENS)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    udf = make_tokenizer_udf("query")
    got = {
        int(r["doc_id"]): list(r["toks"])
        for r in df.select("doc_id", udf("text").alias("toks")).collect()
    }
    for i, (text, _) in enumerate(GOLDENS):
        assert got[i] == jieba.lcut(text), text
