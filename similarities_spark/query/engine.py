"""Distributed BM25 query engine over the term-partitioned block index.

Physical plan (per query batch):

  queries -> tokenize UDF (query mode: NO stopword filter, duplicates kept,
             reference literal_similarity.py:434)
    -> posexplode tokens                              (order-preserving)
    -> DISTINCT (query_id, term)  [tiny]  --broadcast--+
    blocks scan: partition-pruned to bucket IN (query-term buckets),
                 row-group pruned by term via min/max stats  <--- joined here
    -> cogroup(query tokens, matched blocks) BY query_id
       -> applyInPandas: block-max MaxScore kernel (scorer.py)
    -> per-query top-k already ranked; zero-score padding stage only for
       queries the scorer flagged (degenerate small-corpus semantics,
       reference literal_similarity.py:437-440)
    -> optional join docs for corpus text

Only blocks whose term matches some query term are ever shuffled; the big
index never moves otherwise. The scorer task for one query holds that query's
candidate blocks; for single-query latency at extreme scale, search_df's
``fan_out`` option shards scoring by doc-id range (the index's fixed global
salt ranges) with a global top-k merge — bit-identical results, R-way
parallel per query.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from similarities_spark.index.build import BM25Index
from similarities_spark.query import scorer as _scorer
from similarities_spark.tokenize import make_tokenizer_udf

_SCORE_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("range_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("score", DoubleType()),
        StructField("n_matched", LongType()),
        StructField("needs_pad", BooleanType()),
        StructField("pad_score", DoubleType()),
    ]
)


class BM25QueryEngine:
    def __init__(self, index: BM25Index):
        self.index = index
        self.spark = index.spark
        self.cfg = index.config()

    def search(
        self,
        queries: Union[str, Sequence[str], Dict[int, str]],
        topn: int = 10,
        include_text: bool = False,
    ) -> DataFrame:
        """Reference most_similar surface (literal_similarity.py:416-442):
        str | list | dict of queries -> ranked hits DataFrame
        (query_id, rank, doc_id, score [, corpus_doc])."""
        if isinstance(queries, str):
            queries = [queries]
        if isinstance(queries, (list, tuple)):
            queries = {i: q for i, q in enumerate(queries)}
        qdf = self.spark.createDataFrame(
            pd.DataFrame(
                {"query_id": list(queries.keys()), "text": list(queries.values())}
            )
        ).select(F.col("query_id").cast("long"), "text")
        return self.search_df(qdf, topn=topn, include_text=include_text)

    def search_df(
        self,
        queries_df: DataFrame,
        topn: int = 10,
        include_text: bool = False,
        fan_out: Optional[int] = None,
    ) -> DataFrame:
        """``fan_out=R`` splits scoring into R doc-id range shards per query
        (reusing the index's fixed global salt ranges): each (query, range)
        task scores its shard fully (still bit-exact per doc — ranges
        partition the doc space) and emits a local top-k; a global window
        merges. This is the single-query-latency path at extreme scale —
        one query's work spreads over R tasks instead of one. Okapi only
        (BM25Plus pad baselines aren't range-decomposable); small batches
        of fat queries want it, big batches of queries don't need it."""
        cfg = self.cfg
        avgdl = self.index.avgdl
        n_docs = self.index.n_docs
        k1, b, k = cfg.k1, cfg.b, topn
        prune = cfg.score_mode == "wand"
        variant, delta = cfg.variant, cfg.resolved_delta()
        if variant != "okapi":
            fan_out = None

        tok_udf = make_tokenizer_udf("query")
        qtok = queries_df.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.posexplode(tok_udf(F.col("text"))).alias("pos", "term"),
        )

        # independent lineage for the blocks side (queries are tiny; avoids
        # Spark's ambiguous-self-join trap between the two cogroup inputs)
        qterms = queries_df.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.explode(tok_udf(F.col("text"))).alias("term"),
        ).distinct()
        blocks = self.index.blocks().select(
            "term",
            "salt",
            "block_id",
            "min_doc",
            "max_doc",
            "n_postings",
            "tf_max",
            "tf_min",
            "dl_max",
            "dl_min",
            "payload",
        )
        # blocks are stats-free (immutable segments); the per-term df/idf
        # ride in on the tiny broadcast query side instead
        qstats = qterms.join(
            self.index.term_stats().select("term", "df", "idf"), "term", "left"
        )
        # query-term side is tiny -> broadcast into the index scan; Catalyst
        # pushes the bucket/term equality into the parquet scan
        qblocks = F.broadcast(qstats).join(blocks, "term", "inner")

        if fan_out:
            per = max(1, (n_docs + fan_out - 1) // fan_out)
            ranges = self.spark.range(fan_out).select(
                F.col("id").alias("range_id")
            )
            qtok = qtok.crossJoin(F.broadcast(ranges))
            qblocks = qblocks.withColumn(
                "range_id",
                F.explode(
                    F.sequence(
                        (F.col("min_doc") / per).cast("long"),
                        (F.col("max_doc") / per).cast("long"),
                    )
                ),
            )
            keys = ["query_id", "range_id"]
        else:
            per = None
            qtok = qtok.withColumn("range_id", F.lit(0).cast("long"))
            qblocks = qblocks.withColumn("range_id", F.lit(0).cast("long"))
            keys = ["query_id"]

        def score_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            src = left if len(left) else right
            qid = int(src["query_id"].iloc[0])
            rid = int(src["range_id"].iloc[0])
            doc_range = (rid * per, (rid + 1) * per) if per else None
            tokens = list(left.sort_values("pos")["term"])
            ids, scores, n_matched, needs_pad, pad_score = _scorer.score_query(
                tokens, right, k, avgdl, k1, b, prune=prune,
                variant=variant, delta=delta, n_docs=n_docs,
                doc_range=doc_range,
            )
            return pd.DataFrame(
                {
                    "query_id": qid,
                    "range_id": rid,
                    "doc_id": ids,
                    "score": scores,
                    "n_matched": n_matched,
                    "needs_pad": needs_pad,
                    "pad_score": pad_score,
                }
            )

        scored = (
            qtok.groupBy(*keys)
            .cogroup(qblocks.groupBy(*keys))
            .applyInPandas(score_group, _SCORE_SCHEMA)
        )

        hits = self._pad_and_rank(queries_df, scored, k)
        if include_text:
            docs = self.index.docs().select(
                "doc_id", F.col("text").alias("corpus_doc")
            )
            hits = hits.join(docs, "doc_id", "left").select(
                "query_id", "rank", "doc_id", "score", "corpus_doc"
            )
        return hits

    def _pad_and_rank(self, queries_df: DataFrame, scored: DataFrame, k: int) -> DataFrame:
        """Zero-score padding (reference ranks ALL docs; unmatched score 0.0,
        ties by ascending doc_id) + final ranking. Padding work only runs for
        flagged/zero-match queries — never on the happy path at scale.

        ONE driver collect decides the padding set: a left join of the query
        ids against a per-query scored summary (pad flag + match count)."""
        scored = scored.persist()
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )

        # per-range flags first, then per-query: a query needs padding only
        # if EVERY range flagged it (a single unflagged range proves k docs
        # above the pad score exist globally); n_matched sums over ranges
        per_range = scored.select(
            "query_id", "range_id", "n_matched", "needs_pad", "pad_score"
        ).distinct()
        summary = per_range.groupBy("query_id").agg(
            F.min(F.col("needs_pad").cast("int")).alias("pad"),
            F.sum("n_matched").alias("n_matched"),
            F.max("pad_score").alias("pad_score"),
        )
        status = (
            queries_df.select(F.col("query_id").cast("long").alias("query_id"))
            .distinct()
            .join(summary, "query_id", "left")
            .collect()
        )
        flagged = [
            (int(r["query_id"]), int(r["n_matched"]), float(r["pad_score"]))
            for r in status
            if r["pad"] == 1
        ]
        zero_match = [int(r["query_id"]) for r in status if r["pad"] is None]
        pad_ids = [(q, ps) for q, _, ps in flagged] + [
            (q, 0.0) for q in zero_match
        ]

        flagged_qids = {q for q, _ in pad_ids}
        ok = scored.filter(
            ~F.col("query_id").isin(list(flagged_qids))
            if flagged_qids
            else F.lit(True)
        ).select("query_id", "doc_id", "score")
        if not pad_ids:
            return (
                ok.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", "doc_id", "score")
            )

        max_matched = max([m for _, m, _ in flagged], default=0)
        low_docs = (
            self.index.docs()
            .select("doc_id")
            .orderBy("doc_id")
            .limit(k + max_matched)
        )
        pad_q = self.spark.createDataFrame(
            pd.DataFrame(
                {
                    "query_id": [q for q, _ in pad_ids],
                    "score": [ps for _, ps in pad_ids],
                }
            )
        ).select(F.col("query_id").cast("long"), F.col("score").cast("double"))
        zero_rows = pad_q.crossJoin(F.broadcast(low_docs)).join(
            scored.select("query_id", "doc_id"),
            ["query_id", "doc_id"],
            "left_anti",
        )
        pad_rows = (
            scored.filter(F.col("query_id").isin(list(flagged_qids)))
            .select("query_id", "doc_id", "score")
            .unionByName(zero_rows)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        ranked_ok = ok.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )
        return ranked_ok.unionByName(pad_rows).select(
            "query_id", "rank", "doc_id", "score"
        )
