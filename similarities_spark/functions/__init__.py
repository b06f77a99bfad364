from similarities_spark.functions import (
    ann,
    dedup,
    distances,
    graph,
    lexicon,
    multimodal,
    seqmatch,
    textops,
    tfidf,
    w2v,
)

__all__ = [
    "ann", "dedup", "distances", "graph", "lexicon",
    "multimodal", "seqmatch", "textops", "tfidf", "w2v",
]
