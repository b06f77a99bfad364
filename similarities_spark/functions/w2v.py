"""Word-embedding similarity shape (reference WordEmbeddingSimilarity /
BertSimilarity path): encode text -> pooled vector column, then the search
is pure relational cosine (functions/ann.py).

No embedding models ship in this container, so the ENCODER is a
deterministic fake: each token maps to a unit-ish vector seeded by the md5
of the token, mean-pooled over the doc. Swapping in word2vec/BERT weights
changes only `_token_vec` — the Arrow batch plumbing, pooling, schema, and
the downstream cosine top-k are the production shape (reference
bert_similarity.py:222-251 persists exactly such id/doc/vector triples).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, FloatType

from similarities_spark.tokenize import tokenize_text


def _token_vec(token: str, dim: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    v = rng.normal(size=dim)
    return v / np.linalg.norm(v)


def encode_udf(dim: int = 32):
    @F.pandas_udf(ArrayType(FloatType()))
    def _encode(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = tokenize_text(t or "", mode="corpus")
            if not toks:
                out.append(np.zeros(dim, dtype=np.float32).tolist())
                continue
            m = np.mean([_token_vec(tok, dim) for tok in toks], axis=0)
            out.append(m.astype(np.float32).tolist())
        return pd.Series(out)

    return _encode


def embed_corpus(df: DataFrame, text_col: str = "text", dim: int = 32) -> DataFrame:
    return df.withColumn("embedding", encode_udf(dim)(F.col(text_col)))


def most_similar(
    corpus: DataFrame,
    queries: DataFrame,
    topn: int = 10,
    dim: int = 32,
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode both sides (Arrow UDF), then exact cosine top-k (relational)."""
    from similarities_spark.functions import ann

    c = embed_corpus(corpus, text_col, dim).select(
        F.col(id_col).alias("vec_id"), "embedding"
    )
    q = embed_corpus(queries, text_col, dim).select(
        F.col(qid_col).alias("qid"), F.col("embedding").alias("qvec")
    )
    return ann.cosine_topk(c, q, k=topn)
