"""Streaming-ingest throughput: foreachBatch incremental merge vs batch
full rebuild over the same corpus (VERDICT r2 item 10 — the ingest story
needs a number).

Splits the sf corpus into an initial build + K streamed increments, runs
incremental_index_stream (availableNow) over the increments, and reports
docs/sec for (a) the initial full build, (b) the streamed incremental
merges, and (c) a full rebuild over the accumulated corpus — the
reference's per-add_corpus cost model (literal_similarity.py:406-414).

  python scripts/streaming_merge_bench.py [sf_dir] [n_batches]

Prints one JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("streaming-merge-bench")
        .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from similarities_spark.config import EngineConfig
    from similarities_spark.index.build import BM25Index, BM25IndexBuilder
    from similarities_spark.sources.readers import read_documents_as_webtext
    from similarities_spark.streaming.incremental import incremental_index_stream

    cfg = EngineConfig(
        stopwords=frozenset(),
        block_size=128,
        num_term_buckets=int(cpus),
        salt_df_threshold=2000,
        num_salts=8,
    )
    work = tempfile.mkdtemp(prefix="smb_")
    inc_in, staging = os.path.join(work, "in"), os.path.join(work, "staging")
    idx_dir, full_dir = os.path.join(work, "idx"), os.path.join(work, "full")
    os.makedirs(inc_in)

    if sf_dir.endswith(".parquet") and "documents" not in os.path.basename(sf_dir):
        # raw webtext corpus (e.g. scripts/scaling_bench.py --gen output)
        webtext = spark.read.parquet(sf_dir).persist()
    else:
        webtext = read_documents_as_webtext(spark, sf_dir).persist()
    n_total = webtext.count()
    base_n = n_total // 2
    base = webtext.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    rest = webtext.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)
    base_n = base.count()
    inc_n = n_total - base_n

    builder = BM25IndexBuilder(spark, cfg)
    t0 = time.time()
    builder.build(base, idx_dir, input_desc="base")
    build_wall = time.time() - t0

    # lay the increments down as parquet files for readStream to pick up
    for i in range(n_batches):
        rest.filter(
            F.pmod(F.xxhash64("url", F.lit(7)), F.lit(n_batches)) == i
        ).write.mode(
            "overwrite"
        ).parquet(os.path.join(inc_in, f"b{i}"))

    t0 = time.time()
    for i in range(n_batches):
        q = incremental_index_stream(
            spark,
            os.path.join(inc_in, f"b{i}"),
            staging,
            idx_dir,
            cfg=cfg,
            checkpoint_dir=os.path.join(work, f"ckpt{i}"),
        )
        q.awaitTermination()
    merge_wall = time.time() - t0
    merged = BM25Index(spark, idx_dir)
    # cross-batch duplicate texts are DROPPED by merge semantics (reference
    # membership check against the pre-existing corpus,
    # literal_similarity.py:389-401) while a single full build keeps every
    # within-batch dup — so the merged count may fall below n_total by at
    # most the corpus's total duplicate-text surplus
    dropped = n_total - merged.n_docs
    max_dups = n_total - webtext.agg(
        F.countDistinct("text").alias("d")
    ).collect()[0]["d"]
    assert 0 <= dropped <= max_dups, (merged.n_docs, n_total, max_dups)

    # the reference cost model: full rebuild over the accumulated corpus
    t0 = time.time()
    builder.build(webtext, full_dir, input_desc="full")
    rebuild_wall = time.time() - t0

    out = {
        "sf": sf_dir,
        "cpus": int(cpus),
        "n_docs_total": n_total,
        "cross_batch_dups_dropped": dropped,
        "base_docs": base_n,
        "streamed_docs": inc_n,
        "n_batches": n_batches,
        "initial_build_s": round(build_wall, 2),
        "stream_merge_s": round(merge_wall, 2),
        "full_rebuild_s": round(rebuild_wall, 2),
        "initial_build_docs_per_s": round(base_n / build_wall, 1),
        "stream_merge_docs_per_s": round(inc_n / merge_wall, 1),
        "full_rebuild_docs_per_s": round(n_total / rebuild_wall, 1),
    }
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
