"""Similarity search over embedding columns (array<float>).

- cosine_topk       : exact brute-force top-k — the correctness baseline.
                      JVM-side zip_with/aggregate dot products, window top-k.
- lsh_cosine_topk   : random-hyperplane LSH bucketing — the scale path:
                      probes only same-bucket candidates (plus multi-probe
                      neighbors), then exact-rescoring. Recall<1 by design.
- cosine_dup_pairs  : near-duplicate pairs above a cosine threshold.

Scale notes: brute force is a broadcast of the (small) query set against a
full scan — linear, embarrassingly parallel, no shuffle of the corpus. The
LSH variant turns the all-pairs problem into a bucket groupBy. For 10^12
vectors an IVF layout (k-means coarse quantizer as partition key) slots into
the same API; the bucketing column is the only thing that changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from similarities_spark.functions.textops import spread_small_input


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x full scan, window top-k.
    Ties broken by ascending vector id (stable, like the BM25 ranking)."""
    q = queries.select(
        F.col(qid_col).alias("qid"), F.col(qvec_col).alias("qvec")
    )
    v = spread_small_input(vectors).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    scored = v.crossJoin(F.broadcast(q)).select(
        "qid",
        "vec_id",
        cosine(F.col("vec"), F.col("qvec").cast("array<double>")).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def cosine_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold. All-pairs at test
    scale; at web scale feed candidates from lsh buckets instead."""
    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64)


def lsh_bucket_col(vec, planes: np.ndarray):
    """Random-hyperplane signature: bit i = sign(vec . plane_i). Built as a
    Catalyst expression tree over array ops (planes are literals — small)."""
    acc = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(vec, plane) >= 0).cast("long")
        acc = acc + bit * F.lit(int(2**i)).cast("long")
    return acc


def _lsh_candidate_rows(
    vectors: DataFrame,
    queries: DataFrame,
    n_planes: int,
    n_tables: int,
    dim: Optional[int],
    seed: int,
    id_col: str,
    vec_col: str,
    qid_col: str,
    qvec_col: str,
) -> DataFrame:
    """Shared candidate-generation stage: (qid, vec_id, tbl, vec, qvec) —
    one row per (table, probe) hit, before dedup/rescoring. Fully
    deterministic given the seed (the planes derive from RandomState), so
    the distinct projection is externally verifiable (lsh_candidates)."""
    if dim is None:
        # plain array columns don't carry their length in the schema, and a
        # driver-side row probe on a 100 TB table is the wrong place to
        # learn it — the embedding dimension is a property of the pipeline,
        # so the caller must state it (hyperplanes are seeded from (dim,
        # n_planes, seed); guessing dim would silently change the buckets)
        raise ValueError(
            "lsh_candidates/lsh_cosine_topk require dim= (the embedding "
            "dimensionality); it determines the seeded hyperplane tables"
        )
    tables = [
        _hyperplanes(dim, n_planes, seed + 101 * t) for t in range(n_tables)
    ]
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).select(
        "vec_id",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket_col(F.col("vec"), tables[t]).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "vec", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(qvec_col).cast("array<double>").alias("qvec"),
    )
    # multi-probe per table: query bucket plus all 1-bit flips
    probe_structs = []
    for t in range(n_tables):
        qb = lsh_bucket_col(F.col("qvec"), tables[t])
        for flip in [None] + list(range(n_planes)):
            b = qb if flip is None else qb.bitwiseXOR(F.lit(int(2**flip)).cast("long"))
            probe_structs.append(
                F.struct(F.lit(t).alias("tbl"), b.alias("bucket"))
            )
    probes = q.select(
        "qid", "qvec", F.explode(F.array(*probe_structs)).alias("tb")
    ).select("qid", "qvec", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    return v.join(F.broadcast(probes), ["tbl", "bucket"]).select(
        "qid", "vec_id", "tbl", "vec", "qvec"
    )


def lsh_candidates(
    vectors: DataFrame,
    queries: DataFrame,
    n_planes: int = 6,
    n_tables: int = 8,
    # REQUIRED since r5 (the driver-side .first() dim probe was removed);
    # the Optional default survives one release for keyword-call
    # compatibility and raises immediately when omitted
    dim: Optional[int] = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """The DETERMINISTIC prefix of lsh_cosine_topk: distinct
    (qid, vec_id, tbl) candidate hits — vector in the query's bucket or a
    1-bit-flip neighbor, per table. The planes are a pure function of
    (dim, n_planes, seed), so an external engine can regenerate them and
    verify this stage exactly; only the final top-k ranking downstream is
    approximate-by-design."""
    return (
        _lsh_candidate_rows(
            vectors, queries, n_planes, n_tables, dim, seed,
            id_col, vec_col, qid_col, qvec_col,
        )
        .select("qid", "vec_id", "tbl")
        .distinct()
    )


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: Optional[int] = None,  # REQUIRED (keyword for call-site clarity)
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Approximate top-k via standard multi-table random-hyperplane LSH:
    ``n_tables`` independent plane sets; candidates = union over tables of
    vectors in the query's bucket or any 1-bit-flip neighbor (multi-probe),
    exact-cosine rescored. Recall rises with n_tables (miss probability is
    the PRODUCT of per-table misses); cost per table is one bucket join.
    Tune n_planes up (fewer candidates/bucket) and n_tables up (recall) as
    the corpus grows — candidate volume ~ N * n_tables * (n_planes+1) /
    2^n_planes. The candidate stage is exposed (and oracled) separately as
    lsh_candidates."""
    cand = (
        _lsh_candidate_rows(
            vectors, queries, n_planes, n_tables, dim, seed,
            id_col, vec_col, qid_col, qvec_col,
        )
        .select(
            "qid", "vec_id", cosine(F.col("vec"), F.col("qvec")).alias("cosine")
        )
        # a candidate found by several tables/probes is rescored once
        .groupBy("qid", "vec_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )
