"""ONE cold index build in a fresh process/JVM — the A/B unit for the
cold-build drift investigation (VERDICT r4 'Next round' #1b).

Usage: python cold_build_once.py <tree_path> <sf_dir> <cpus> [label]

Imports the engine from <tree_path> (a git worktree of any round's code),
builds the bench-identical headline index once, and prints ONE JSON line
with the wall, the builder's per-stage walls, and a same-process memcpy
probe. A fresh interpreter + JVM per build is the point: the r4 drift was
isolated to the COLD first build (warmed A/Bs were flat), so the unit of
measurement must include JVM/Arrow/import warmup.
"""

import json
import os
import sys
import tempfile
import time


def main():
    tree, sf_dir, cpus = sys.argv[1], sys.argv[2], sys.argv[3]
    label = sys.argv[4] if len(sys.argv) > 4 else tree
    sys.path.insert(0, tree)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

    from calib import probe  # repo scripts/ dir: probe is tree-independent

    pre = probe()

    from pyspark.sql import SparkSession

    t_jvm = time.time()
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cold-build-ab")
        .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    jvm_s = round(time.time() - t_jvm, 3)

    from similarities_spark.config import EngineConfig
    from similarities_spark.index.build import BM25IndexBuilder
    from similarities_spark.sources.readers import read_documents_as_webtext

    cfg = EngineConfig(
        stopwords=frozenset(),
        block_size=128,
        num_term_buckets=int(cpus),
        salt_df_threshold=2000,
        num_salts=8,
    )
    idx_dir = tempfile.mkdtemp(prefix="ab_cold_")
    webtext = read_documents_as_webtext(spark, sf_dir)
    t0 = time.time()
    index = BM25IndexBuilder(spark, cfg).build(webtext, idx_dir, input_desc=sf_dir)
    wall = round(time.time() - t0, 3)
    out = {
        "label": label,
        "tree": tree,
        "wall_s": wall,
        "jvm_startup_s": jvm_s,
        "stage_wall_s": index.meta.get("stage_wall_s"),
        "resolved_postings_mode": index.meta.get("resolved_postings_mode"),
        "n_docs": index.n_docs,
        "probe_pre": pre,
    }
    spark.stop()
    import shutil

    shutil.rmtree(idx_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
