"""Production ingest lifecycle at scale (VERDICT r4 'Next round' #5):
long incremental-merge chain -> query-latency-vs-segment-count curve ->
compaction -> recovery.

The merge and compact paths are parity-tested individually; this measures
the full lifecycle ONE index actually lives through: a base build, then
K incremental merges of B docs each (work must stay ~flat per batch: the
merge re-encodes only the new batch plus a vocab-sized stats refresh),
with a fixed 20-query probe batch timed every `--probe-every` merges (the
cost of accumulated segments is paid at query time — every segment adds
per-term block rows), then `compact` (single re-encode of the accumulated
payloads) and a final probe showing the recovery.

Emits JSON lines (also appended to --out):
  {"kind":"base_build", ...}
  {"kind":"merge", "i":i, "wall_s":..., "added":..., "n_docs":...}
  {"kind":"query_probe", "after_merges":k, "wall_s":..., "segments":...}
  {"kind":"compact", ...}
  {"kind":"summary", ...}

Usage: python scripts/lifecycle_bench_r5.py [--merges 50] [--batch 20000]
           [--base 100000] [--probe-every 10] [--out BENCH/lifecycle_r5.jsonl]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--merges", type=int, default=50)
    ap.add_argument("--batch", type=int, default=20_000)
    ap.add_argument("--base", type=int, default=100_000)
    ap.add_argument("--probe-every", type=int, default=10)
    ap.add_argument("--probe-queries", type=int, default=20)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--work", default="/tmp/lifecycle_r5")
    ap.add_argument("--out", default="BENCH/lifecycle_r5.jsonl")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("lifecycle-bench")
        .config("spark.sql.shuffle.partitions", str(max(16, int(args.cpus))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from similarities_spark.config import EngineConfig
    from similarities_spark.index.build import BM25Index, BM25IndexBuilder
    from similarities_spark.query.engine import BM25QueryEngine
    from similarities_spark.sources.synth import synth_webtext_distributed

    cfg = EngineConfig(
        stopwords=frozenset(),
        block_size=128,
        num_term_buckets=int(args.cpus),
        salt_df_threshold=20_000,
        num_salts=16,
        salt_sample_fraction=0.05,
    )
    shutil.rmtree(args.work, ignore_errors=True)
    os.makedirs(args.work)
    idx_dir = os.path.join(args.work, "idx")
    builder = BM25IndexBuilder(spark, cfg)

    out_f = open(args.out, "a")

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        out_f.write(line + "\n")
        out_f.flush()

    # ---- base build ----
    base = synth_webtext_distributed(
        spark, n_docs=args.base, seed=1000, partitions=64
    )
    t0 = time.time()
    index = builder.build(base, idx_dir, input_desc="lifecycle-base")
    emit({
        "kind": "base_build",
        "n_docs": index.n_docs,
        "wall_s": round(time.time() - t0, 2),
        "cpus": int(args.cpus),
        "batch": args.batch,
        "merges": args.merges,
    })

    # probe vocabulary: mid-tail terms, fixed across the whole run so the
    # latency curve measures segment accumulation, not query drift
    terms = [
        r["term"]
        for r in index.term_stats()
        .filter((F.col("df") >= 50) & (F.col("df") <= 2000))
        .orderBy(F.desc("df"), "term")
        .limit(64)
        .collect()
    ]
    probe_rows = [
        (
            i,
            f"{terms[i % len(terms)]} {terms[(i * 7 + 3) % len(terms)]} "
            f"{terms[(i * 13 + 11) % len(terms)]}",
        )
        for i in range(args.probe_queries)
    ]

    def probe(after_merges, segments):
        qdf = spark.createDataFrame(probe_rows, "query_id long, text string")
        idx = BM25Index(spark, idx_dir)
        eng = BM25QueryEngine(idx)
        # one warm + one timed run: the probe measures steady-state query
        # latency against the CURRENT segment layout, not footer caching
        eng.search_df(qdf, topn=10).count()
        t0 = time.time()
        n = eng.search_df(qdf, topn=10).count()
        wall = time.time() - t0
        eng.close()
        emit({
            "kind": "query_probe",
            "after_merges": after_merges,
            "segments": segments,
            "wall_s": round(wall, 3),
            "n_hits": n,
            "n_docs": idx.n_docs,
        })

    probe(0, 0)

    # ---- merge chain ----
    merge_walls = []
    for i in range(1, args.merges + 1):
        batch_path = os.path.join(args.work, "batch.parquet")
        synth_webtext_distributed(
            spark, n_docs=args.batch, seed=2000 + i, partitions=16
        ).write.mode("overwrite").parquet(batch_path)
        new_docs = spark.read.parquet(batch_path)
        t0 = time.time()
        index = builder.merge_new_docs(new_docs, idx_dir)
        wall = round(time.time() - t0, 2)
        merge_walls.append(wall)
        segments = len(index.meta.get("increments", []))
        emit({
            "kind": "merge",
            "i": i,
            "wall_s": wall,
            "added": index.meta["increments"][-1]["added_docs"]
            if index.meta.get("increments")
            else None,
            "n_docs": index.n_docs,
            "segments": segments,
        })
        if i % args.probe_every == 0:
            probe(i, segments)

    # ---- compact + recovery ----
    t0 = time.time()
    index = builder.compact(idx_dir)
    emit({
        "kind": "compact",
        "wall_s": round(time.time() - t0, 2),
        "n_docs": index.n_docs,
    })
    probe(args.merges, 0)

    half = len(merge_walls) // 2
    emit({
        "kind": "summary",
        "merge_wall_first_half_avg_s": round(
            sum(merge_walls[:half]) / max(1, half), 2
        ),
        "merge_wall_second_half_avg_s": round(
            sum(merge_walls[half:]) / max(1, len(merge_walls) - half), 2
        ),
        "merge_wall_min_s": min(merge_walls),
        "merge_wall_max_s": max(merge_walls),
        "final_n_docs": index.n_docs,
    })
    out_f.close()
    spark.stop()


if __name__ == "__main__":
    main()
