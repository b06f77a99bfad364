"""Structured Streaming surfaces.

1) incremental_index_stream — the streaming analog of the reference's
   add_corpus (reference literal_similarity.py:381-406, which fully rebuilds
   its in-memory index per call): new webtext files landing in a directory
   are ingested via readStream + foreachBatch; each micro-batch appends the
   new docs to a staging corpus table and (re)builds the index from the
   accumulated corpus. Full rebuild per batch mirrors reference semantics
   exactly; an incremental merge (encode only new postings, merge salt
   segments) is the scale extension and slots into the same foreachBatch.

2) windowed_event_counts — generic late-data-tolerant windowed aggregation
   (watermark + tumbling window) over an event stream; exercised in tests
   with availableNow over the driver's events table shape.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from similarities_spark.config import EngineConfig
from similarities_spark.index.build import BM25IndexBuilder


def incremental_index_stream(
    spark: SparkSession,
    input_dir: str,
    staging_dir: str,
    index_dir: str,
    cfg: EngineConfig = EngineConfig(),
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """readStream(webtext parquet dir) -> foreachBatch: append to staging
    corpus, rebuild index over the accumulated corpus. Returns the query."""
    schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        batch_df.write.mode("append").parquet(staging_dir)
        builder = BM25IndexBuilder(spark, cfg)
        if os.path.exists(os.path.join(index_dir, "meta.json")):
            # incremental merge: append-only segments + stats refresh —
            # result provably identical to a full rebuild over the
            # accumulated corpus (tests/test_incremental_merge.py)
            builder.merge_new_docs(batch_df, index_dir)
        else:
            corpus = spark.read.parquet(staging_dir)
            builder.build(corpus, index_dir, input_desc=f"stream-batch-{batch_id}")

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation",
        checkpoint_dir or os.path.join(staging_dir, "_stream_ckpt"),
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts — works on both batch and
    streaming DataFrames (same plan; watermark only binds in streaming)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            F.col("n").cast("long"),
        )
    )


def streaming_exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Cross-batch exact dedup on an ingest stream — the Spark-native
    replacement for the reference's corpus-membership check
    (literal_similarity.py:389-401) at streaming ingest: the state store
    keeps one 16-byte md5 per distinct text and the watermark BOUNDS state
    (a text seen again after the watermark expires is admitted — at 100 TB
    unbounded seen-set state is not an option; pair with the batch
    merge_new_docs anti-join for exactness beyond the watermark horizon).
    On a batch DataFrame the same call degrades to a plain dropDuplicates.

    Null-text rows PASS THROUGH un-deduplicated: md5(null) is null and both
    dropDuplicates and dropDuplicatesWithinWatermark treat nulls as equal,
    which would silently collapse every null-text row in the stream into
    one survivor. A null text is not a duplicate of anything — downstream
    ingest decides whether to reject it.
    """
    with_text = df.filter(F.col(text_col).isNotNull()).withColumn(
        "_h", F.md5(F.col(text_col))
    )
    if with_text.isStreaming:
        deduped = with_text.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(["_h"])
    else:
        deduped = with_text.dropDuplicates(["_h"])
    return deduped.drop("_h").unionByName(df.filter(F.col(text_col).isNull()))


# running per-language corpus stats: custom stateful operator surface
_LANG_STATS_OUT = "lang string, docs bigint, tokens bigint"
_LANG_STATS_STATE = "docs bigint, tokens bigint"


def running_language_stats(
    stream: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
):
    """applyInPandasWithState demo of the custom-stateful-operator shape:
    per-language RUNNING totals (docs, tokens) across micro-batches. The
    per-group state is two longs — language cardinality bounds total state.
    Emits one updated row per language per batch (update mode)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from similarities_spark.functions.textops import token_count

    def update(key, pdfs, state):
        docs = 0
        tokens = 0
        for pdf in pdfs:
            docs += len(pdf)
            tokens += int(pdf["n_tokens"].sum())
        d0, t0 = state.get if state.exists else (0, 0)
        state.update((d0 + docs, t0 + tokens))
        yield pd.DataFrame(
            {"lang": [key[0]], "docs": [d0 + docs], "tokens": [t0 + tokens]}
        )

    src = stream.select(
        F.col(lang_col).alias("lang"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    return src.groupBy("lang").applyInPandasWithState(
        update,
        _LANG_STATS_OUT,
        _LANG_STATS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )
