"""Lexicon-based word/sentence similarity (Cilin / Hownet operator shape).

The reference ships two Chinese lexicons and computes sentence similarity as
max-over-senses word-pair scores combined by directed averages
(reference literal_similarity.py:657-720 Cilin, :809-853 Hownet). The
lexicon DATA is not redistributed here; the operator takes any
(word, sense_key) lexicon DataFrame and reproduces the combination shape:

  word_sim(w1, w2)      = max over sense pairs of sense_sim
  sent_sim(s1, s2)      = (avg over w1 of max_w2 word_sim
                           + avg over w2 of max_w1 word_sim) / 2

sense_sim here is pluggable; default = shared-prefix depth ratio of the
sense keys (Cilin-style hierarchical codes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from similarities_spark.functions.textops import tokens_col


def sense_prefix_sim(k1, k2, depth: int = 5):
    """Cilin-style: similarity = shared-prefix length / code depth."""
    parts = [
        (F.substring(k1, 1, i) == F.substring(k2, 1, i)).cast("int")
        for i in range(1, depth + 1)
    ]
    shared = parts[0]
    for p in parts[1:]:
        shared = shared + p
    return shared / float(depth)


def word_pair_sim(lexicon: DataFrame, pairs: DataFrame) -> DataFrame:
    """pairs (w1, w2) x lexicon (word, sense_key) -> (w1, w2, sim):
    max over sense-key pairs. Unknown words score 0."""
    l1 = lexicon.select(F.col("word").alias("w1"), F.col("sense_key").alias("k1"))
    l2 = lexicon.select(F.col("word").alias("w2"), F.col("sense_key").alias("k2"))
    scored = (
        pairs.join(l1, "w1", "left")
        .join(l2, "w2", "left")
        .withColumn(
            "s",
            F.when(
                F.col("k1").isNotNull() & F.col("k2").isNotNull(),
                sense_prefix_sim(F.col("k1"), F.col("k2")),
            ).otherwise(F.lit(0.0)),
        )
    )
    return scored.groupBy("w1", "w2").agg(F.max("s").alias("sim"))


def sentence_sim(
    lexicon: DataFrame, sents: DataFrame, s1_col: str = "s1", s2_col: str = "s2"
) -> DataFrame:
    """sents (pair_id, s1, s2) -> (pair_id, sim) via directed-average of
    per-word best matches — the reference's combination rule."""
    t1 = sents.select(
        "pair_id", F.explode(tokens_col(F.col(s1_col))).alias("w1")
    ).distinct()
    t2 = sents.select(
        "pair_id", F.explode(tokens_col(F.col(s2_col))).alias("w2")
    ).distinct()
    pairs = t1.join(t2, "pair_id").select("pair_id", "w1", "w2").distinct()
    sims = word_pair_sim(lexicon, pairs.select("w1", "w2").distinct())
    scored = pairs.join(sims, ["w1", "w2"], "left").fillna({"sim": 0.0})
    d1 = (
        scored.groupBy("pair_id", "w1")
        .agg(F.max("sim").alias("best"))
        .groupBy("pair_id")
        .agg(F.avg("best").alias("a1"))
    )
    d2 = (
        scored.groupBy("pair_id", "w2")
        .agg(F.max("sim").alias("best"))
        .groupBy("pair_id")
        .agg(F.avg("best").alias("a2"))
    )
    return d1.join(d2, "pair_id").select(
        "pair_id", F.round((F.col("a1") + F.col("a2")) / 2.0, 6).alias("sim")
    )
