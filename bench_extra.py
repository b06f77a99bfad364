"""Profiling companion to bench.py (guide §1: measure first; §1.4 noop sink).

NOT the frozen headline bench — this file exists so optimization work can
attribute each phase's wall to individual Spark jobs/stages. It runs the
same phases as bench.py with `spark.sparkContext.setJobDescription` labels
and an event log, then prints a per-phase job breakdown parsed from the log.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python bench_extra.py [phase ...]
Phases: build query minhash simhash cosine text (default: all)
"""

import json
import os
import shutil
import sys
import tempfile
import time


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    phases = sys.argv[1:] or ["build", "query", "minhash", "simhash", "cosine", "text"]

    evt_dir = tempfile.mkdtemp(prefix="bench_evt_")

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("similarities-spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evt_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from similarities_spark.config import EngineConfig
    from similarities_spark.functions import ann, dedup, textops
    from similarities_spark.index.build import BM25IndexBuilder
    from similarities_spark.query.engine import BM25QueryEngine
    from similarities_spark.sources.readers import read_documents_as_webtext

    timings = {}

    def clock(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return out

    idx_dir = tempfile.mkdtemp(prefix="benchx_idx_")
    cfg = EngineConfig(
        stopwords=frozenset(),
        block_size=128,
        num_term_buckets=int(cpus),
        salt_df_threshold=2000,
        num_salts=8,
    )
    webtext = read_documents_as_webtext(spark, sf_dir)
    builder = BM25IndexBuilder(spark, cfg)
    index = clock("index_build", lambda: builder.build(webtext, idx_dir, input_desc=sf_dir))

    if "query" in phases:
        terms = [
            r["term"]
            for r in index.term_stats().orderBy(F.desc("df")).limit(40).collect()
        ]
        qs = []
        for i in range(200):
            a, b, c = terms[i % len(terms)], terms[(i * 7 + 3) % len(terms)], terms[
                (i * 13 + 11) % len(terms)
            ]
            qs.append(f"{a} {b} {c}")
        engine = BM25QueryEngine(index)
        clock("bm25_batch", lambda: engine.search(qs, topn=10).count())
        clock("bm25_small_batch", lambda: engine.search(qs[:20], topn=10).count())
        clock("bm25_batch2", lambda: engine.search(qs, topn=10).count())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if "minhash" in phases:
        clock(
            "minhash_lsh",
            lambda: dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4).count(),
        )
        clock(
            "minhash_lsh2",
            lambda: dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4).count(),
        )
    if "simhash" in phases:
        clock("simhash64", lambda: dedup.simhash64(docs).count())
        clock("simhash64_2", lambda: dedup.simhash64(docs).count())
    if "cosine" in phases:
        qv = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        clock("cosine_topk", lambda: ann.cosine_topk(emb, qv, k=5).count())
    if "text" in phases:
        clock(
            "text_features",
            lambda: textops.add_text_features(docs).select(F.sum("n_tokens")).collect(),
        )

    spark.stop()
    shutil.rmtree(idx_dir, ignore_errors=True)

    # ---- parse the event log: per-phase job list with walls ----
    logf = []
    for root, _dirs, files in os.walk(evt_dir):
        for f in files:
            if f.startswith("events_") or f.startswith("local-"):
                logf.append(os.path.join(root, f))
    jobs = {}  # id -> dict
    stages = {}  # id -> (name, wall, ntasks)
    task_m = {}  # stage id -> aggregated task metrics
    with open(logf[0], "r", encoding="utf-8") as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {
                    "desc": e.get("Properties", {}).get("spark.job.description", ""),
                    "t0": e["Submission Time"],
                    "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                }
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["wall"] = (
                        e["Completion Time"] - jobs[e["Job ID"]]["t0"]
                    ) / 1000.0
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                if "Completion Time" in si and "Submission Time" in si:
                    stages[si["Stage ID"]] = (
                        si["Stage Name"].split("\n")[0],
                        (si["Completion Time"] - si["Submission Time"]) / 1000.0,
                        si["Number of Tasks"],
                    )
            elif ev == "SparkListenerTaskEnd":
                m = e.get("Task Metrics") or {}
                sid = e["Stage ID"]
                agg = task_m.setdefault(
                    sid, {"run": 0, "gc": 0, "deser": 0, "ser": 0, "n": 0}
                )
                agg["run"] += m.get("Executor Run Time", 0)
                agg["gc"] += m.get("JVM GC Time", 0)
                agg["deser"] += m.get("Executor Deserialize Time", 0)
                agg["ser"] += m.get("Result Serialization Time", 0)
                agg["n"] += 1
    print("\n==== phase walls ====")
    print(json.dumps(timings, indent=1))
    print("\n==== jobs by phase ====")
    by_desc = {}
    for jid in sorted(jobs):
        j = jobs[jid]
        d = j["desc"] or "(none)"
        by_desc.setdefault(d, []).append(jid)
    for d, jids in by_desc.items():
        tot = sum(jobs[j].get("wall", 0) for j in jids)
        print(f"\n-- {d}: {len(jids)} jobs, {tot:.2f}s total job wall")
        for jid in jids:
            j = jobs[jid]
            st = []
            for sid in j["stages"]:
                if sid not in stages:
                    continue
                tm = task_m.get(sid, {})
                mstr = (
                    f" run={tm.get('run', 0)/1000:.2f}s gc={tm.get('gc', 0)/1000:.2f}s"
                    f" deser={tm.get('deser', 0)/1000:.2f}s"
                    if tm
                    else ""
                )
                st.append(
                    f"{sid}({stages[sid][1]:.2f}s/{stages[sid][2]}t{mstr})"
                )
            print(f"   job {jid}: {j.get('wall', -1):.2f}s  stages: {'; '.join(st)}")
    shutil.rmtree(evt_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
