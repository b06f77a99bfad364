"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst column expressions (JVM-side, whole-stage codegen, no
Python in the hot path) so they hold up on a 1000-executor scan of 100 TB:
language-ID heuristic, quality scoring, token counting, fingerprinting.

The tokenization regex matches the engine's fallback tokenizer
(similarities_spark/tokenize.py) so text features and the BM25 index agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from similarities_spark.tokenize import TOKEN_PATTERN

# single source of truth with the engine tokenizer (tokenize.TOKEN_PATTERN):
# Python re, Java regex, and DuckDB RE2 all interpret this pattern string
# identically (explicit ASCII whitespace class).
TOKEN_RE = TOKEN_PATTERN

# tiny fixed stopword list for quality features (public English stopwords)
QUALITY_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def spread_small_input(df: DataFrame) -> DataFrame:
    """Round-robin-spread an under-partitioned input across the cluster.

    A small parquet table (or one huge unsplittable file) arrives as fewer
    scan partitions than there are cores, so every map-heavy operator built
    on it (shingling, hashing, per-token aggregation) runs serially on a
    handful of tasks while the rest of the cluster idles (guide §2.5 "input
    skew"). When the scan already has >= defaultParallelism partitions this
    is a no-op — at warehouse scale inputs are many-file and never take the
    repartition, so the exchange only ever moves data that is small by
    construction. Row-distribution only: results of the deterministic
    per-row transforms downstream are unchanged."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= target:
        return df
    return df.repartition(target)


def tokens_col(text: Column) -> Column:
    """JVM-side tokenization (regexp_extract_all) — identical semantics to
    the Python fallback tokenizer, but runs in whole-stage codegen."""
    return F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def cjk_ratio(text: Column) -> Column:
    """Fraction of CJK codepoints — the language-ID signal."""
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    return cjk / F.greatest(F.length(text), F.lit(1))


def lang_id(text: Column) -> Column:
    """Deterministic n-gram-free language heuristic: scripts + word shape.
    (The reference carries a per-row lang column; this recomputes a label
    from content so mislabeled rows can be caught at scale.)"""
    ratio = cjk_ratio(text)
    avg_wlen = char_count(text) / F.greatest(token_count(text), F.lit(1))
    return (
        F.when(ratio > 0.30, F.lit("cjk"))
        .when(ratio > 0.05, F.lit("mixed"))
        .when(avg_wlen < 4.5, F.lit("latin_short"))
        .otherwise(F.lit("latin_long"))
    )


def stopword_ratio(text: Column) -> Column:
    toks = tokens_col(F.lower(text))
    sw = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9_\s一-鿿]", ""))
    return punct / F.greatest(F.length(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length sweet-spot, sane stopword
    share, low punctuation noise. Deterministic closed form -> SQL oracle."""
    n_tok = token_count(text)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sw = stopword_ratio(text)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.25))
    p_score = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    return F.round((len_score + sw_score + p_score) / 3.0, 6)


def token_count_bpeish(text: Column) -> Column:
    """BPE-ish token estimate: whitespace words plus a char/4 subword term —
    the standard cheap proxy when no tokenizer model ships with the job."""
    words = token_count(text)
    subword = F.ceil(F.length(text) / F.lit(4.0))
    return F.greatest(words, subword.cast("long"))


def fingerprint(text: Column) -> Column:
    """64-bit-equivalent content fingerprint: first 16 hex chars of md5 —
    portable across engines (exact dedup / shard-stable sampling key)."""
    return F.substring(F.md5(text), 1, 16)


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Same outputs as composing the helpers above, but the two token
    arrays (raw for counts, lowercased for the stopword ratio) are staged
    in their own projection and shared by every feature — the composed
    helpers would tokenize the text four times per row (n_tokens, lang_id,
    quality, bpeish each re-derive the array). Expressions and float
    arithmetic are otherwise identical, so outputs are bit-equal."""
    t = F.col(text_col)
    staged = df.select(
        "*",
        tokens_col(t).alias("_toks"),
        tokens_col(F.lower(t)).alias("_toksl"),
    )
    n_tok = F.size(F.col("_toks"))
    # lang_id over the staged count
    ratio = cjk_ratio(t)
    avg_wlen = char_count(t) / F.greatest(n_tok, F.lit(1))
    lang = (
        F.when(ratio > 0.30, F.lit("cjk"))
        .when(ratio > 0.05, F.lit("mixed"))
        .when(avg_wlen < 4.5, F.lit("latin_short"))
        .otherwise(F.lit("latin_long"))
    )
    # quality_score over the staged arrays
    toksl = F.col("_toksl")
    sw_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_sw = F.size(F.filter(toksl, lambda x: F.array_contains(sw_arr, x)))
    sw_ratio = n_sw / F.greatest(F.size(toksl), F.lit(1))
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sw_score = F.lit(1.0) - F.abs(sw_ratio - F.lit(0.25))
    p_score = F.lit(1.0) - F.least(punct_ratio(t) * 4, F.lit(1.0))
    quality = F.round((len_score + sw_score + p_score) / 3.0, 6)
    bpeish = F.greatest(
        n_tok, F.ceil(F.length(t) / F.lit(4.0)).cast("long")
    )
    return staged.select(
        *df.columns,
        n_tok.alias("n_tokens"),
        lang.alias("lang_pred"),
        quality.alias("quality"),
        bpeish.alias("n_tokens_bpeish"),
        fingerprint(t).alias("fp"),
    )
