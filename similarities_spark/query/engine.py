"""Distributed BM25 query engine over the term-partitioned block index.

Physical plan (per query batch):

  queries -> tokenize UDF (query mode: NO stopword filter, duplicates kept,
             reference literal_similarity.py:434)
    -> posexplode tokens                              (order-preserving)
    -> DISTINCT (query_id, term) COLLECTED driver-side [O(queries x qlen),
       tiny by contract] -> terms, buckets = pmod(xxhash64(term), B), and
       per-term df/idf looked up from term_stats
    blocks scan: filter bucket IN (query-term buckets)  -> parquet PARTITION
                 pruning (bucket is the partition column), AND term IN
                 (query terms) -> row-group min/max stats pruning (blocks
                 are written sorted by term within each bucket)
    -> cogroup(query tokens, matched blocks) BY query_id [, range_id]
       -> applyInPandas: block-max MaxScore kernel (scorer.py)
    -> per-query top-k already ranked; zero-score padding stage only for
       queries the scorer flagged (degenerate small-corpus semantics,
       reference literal_similarity.py:437-440)
    -> optional join docs for corpus text

Only index partitions/row-groups holding query terms are ever READ, and only
matching blocks are shuffled; the big index never moves otherwise. The
scorer task for one query holds that query's candidate blocks; for fat
(head-term) queries, scoring auto-shards by doc-id range when the estimated
candidate volume (sum of df over query terms) exceeds
``cfg.fan_out_threshold`` — bit-identical results, R-way parallel per query
(``fan_out=`` forces a specific R).
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
        self.last_fan_out: Optional[int] = None
        # the one cached DF per search (scored): kept alive while the caller
        # materializes the returned hits, released on the NEXT search (or
        # close()) — a long-lived session issuing thousands of batches must
        # not accumulate block-manager entries until LRU churn
        self._live_scored: Optional[DataFrame] = None

    def close(self) -> None:
        """Release the engine's cached intermediate (idempotent)."""
        if self._live_scored is not None:
            self._live_scored.unpersist()
            self._live_scored = None

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
        """``fan_out=R`` splits scoring into R doc-id range shards per query:
        each (query, range) task scores its shard fully (still bit-exact per
        doc — ranges partition the doc space) and emits a local top-k; a
        global window merges. This is the single-query-latency path at
        extreme scale — one query's work spreads over R tasks instead of
        one. When ``fan_out`` is None it auto-enables (Okapi/BM25L — their
        unmatched-doc contribution is exactly 0, so scoring decomposes over
        doc ranges; BM25Plus's per-token idf*delta baseline does not) once
        the estimated candidate volume of the fattest query exceeds
        ``cfg.fan_out_threshold`` postings."""
        cfg = self.cfg
        avgdl = self.index.avgdl
        n_docs = self.index.n_docs
        k1, b, k = cfg.k1, cfg.b, topn
        prune = cfg.score_mode == "wand"
        variant, delta = cfg.variant, cfg.resolved_delta()
        if variant not in ("okapi", "bm25l"):
            fan_out = None

        tok_udf = make_tokenizer_udf("query")
        qtok = queries_df.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.posexplode(tok_udf(F.col("text"))).alias("pos", "term"),
        )

        # ---- driver-side query-term prep (the ONLY collect on this path;
        # O(#queries x query_len) — queries are driver-adjacent by contract).
        # Yields: the partition/row-group pruning predicates for the blocks
        # scan, the broadcast df/idf stats (no vocab-table join in the
        # plan), and the candidate-volume estimate for auto fan-out.
        qt_rows = (
            queries_df.select(
                F.col("query_id").cast("long").alias("query_id"),
                F.explode(tok_udf(F.col("text"))).alias("term"),
            )
            .distinct()
            .collect()
        )
        qt_pairs = [(int(r["query_id"]), r["term"]) for r in qt_rows]
        terms = sorted({t for _, t in qt_pairs})
        if terms:
            # bucket of each term via the SAME JVM xxhash64 the writer used
            buckets = sorted(
                {
                    int(r["bucket"])
                    for r in self.spark.createDataFrame(
                        [(t,) for t in terms], "term string"
                    )
                    .select(
                        F.pmod(
                            F.xxhash64("term"), F.lit(cfg.num_term_buckets)
                        )
                        .cast("int")
                        .alias("bucket")
                    )
                    .collect()
                }
            )
            stat_map = {
                r["term"]: (int(r["df"]), float(r["idf"]))
                for r in self.index.term_stats()
                .filter(F.col("term").isin(terms))
                .collect()
            }
        else:
            buckets, stat_map = [], {}

        # partition pruning (bucket IN ...) + row-group stats pruning
        # (term IN ...): only index files/row-groups holding query terms
        # are read — the rest of the 100 TB index is never touched
        blocks = self.index.blocks()
        if buckets:
            blocks = blocks.filter(F.col("bucket").isin(buckets)).filter(
                F.col("term").isin(terms)
            )
        else:
            blocks = blocks.filter(F.lit(False))
        blocks = blocks.select(
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
        # blocks are stats-free (immutable segments); per-term df/idf ride
        # in on the tiny broadcast query side, built driver-side from the
        # stats lookup above (terms absent from the index carry no blocks,
        # so they are skipped here — the inner join would drop them anyway)
        known = [
            (q, t, stat_map[t][0], stat_map[t][1])
            for q, t in qt_pairs
            if t in stat_map
        ]
        qstats = self.spark.createDataFrame(
            known, "query_id long, term string, df long, idf double"
        )
        qblocks = F.broadcast(qstats).join(blocks, "term", "inner")

        if fan_out is None and cfg.fan_out_threshold:
            # auto fan-out: candidate volume of the fattest query, estimated
            # as sum(df) over its in-index terms (exact upper bound on the
            # postings one scorer task would decode)
            per_q: Dict[int, int] = {}
            for q, t, df_, _ in known:
                per_q[q] = per_q.get(q, 0) + df_
            max_cand = max(per_q.values(), default=0)
            if (
                variant in ("okapi", "bm25l")
                and max_cand > cfg.fan_out_threshold
            ):
                fan_out = min(
                    cfg.fan_out_max,
                    -(-max_cand // cfg.fan_out_threshold),
                )
        # observability (and test hook): the fan-out actually used
        self.last_fan_out = fan_out

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
        self.close()  # release the previous search's cache before persisting
        scored = scored.persist()
        self._live_scored = scored
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
