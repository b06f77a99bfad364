"""Physical-plan audit: captures .explain('formatted') for the engine's key
paths and greps for the properties that matter at 100 TB:

- blocks scan partition-pruned / filtered to query-term buckets
- broadcast join of query terms into the index scan (no index shuffle)
- PushedFilters / ReadSchema pruning on parquet scans
- WholeStageCodegen coverage of the relational stages

Writes BENCH/PLANS.md. Run: python scripts/explain_audit.py [sf_dir]
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def grab_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
        df.explain()  # simple mode: '*(n)' marks WholeStageCodegen spans
    return buf.getvalue()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        # AQE off ONLY for the audit: AdaptiveSparkPlan hides the
        # WholeStageCodegen spans until execution; production runs keep AQE on
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from similarities_spark.query.engine import BM25QueryEngine

    sections = []

    idx = E._get_index(spark, sf_dir)
    engine = BM25QueryEngine(idx)

    # 1) query path: blocks join + cogroup scoring
    hits = engine.search(["dup key scan"], topn=10)
    p = grab_plan(hits)
    sections.append(("BM25 query path (search -> hits)", p))

    # 2) raw blocks scan with term filter (row-group pruning surface)
    blk = idx.blocks().filter(F.col("term") == "dup").select("term", "payload")
    sections.append(("blocks scan filtered by term", grab_plan(blk)))

    # 3) postings build plan (tokenize -> explode -> agg)
    post = E.q_bm25_postings(spark, sf_dir)
    sections.append(("postings build (explode -> partial+final agg)", grab_plan(post)))

    # 4) cosine topk (broadcast of queries)
    cos = E.q_cosine_topk(spark, sf_dir)
    sections.append(("cosine top-k (broadcast queries x scan)", grab_plan(cos)))

    checks = []
    qp = sections[0][1]
    checks.append(("query path broadcasts query terms (no index shuffle)",
                   "BroadcastHashJoin" in qp or "BroadcastExchange" in qp))
    bp = sections[1][1]
    checks.append(("term filter pushed to blocks parquet scan",
                   "PushedFilters: [IsNotNull(term), EqualTo(term,dup)]" in bp
                   or "EqualTo(term,dup)" in bp))
    checks.append(("blocks scan reads only needed columns",
                   "ReadSchema" in bp and "tf_max" not in bp.split("ReadSchema")[1][:200]))
    pp = sections[2][1]
    checks.append(("postings agg is partial+final hash agg",
                   pp.count("HashAggregate") >= 2))
    checks.append(("postings plan uses whole-stage codegen",
                   "*(1)" in pp or "WholeStageCodegen" in pp))
    cp = sections[3][1]
    checks.append(("cosine uses broadcast join", "Broadcast" in cp))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/PLANS.md", "w") as f:
        f.write("# Physical-plan audit (captured via .explain('formatted'))\n\n")
        f.write(f"Input: `{sf_dir}`. Regenerate: `python scripts/explain_audit.py`.\n\n")
        f.write("## Checks\n\n")
        for name, ok in checks:
            f.write(f"- [{'x' if ok else ' '}] {name}\n")
        for title, plan in sections:
            f.write(f"\n## {title}\n\n```\n{plan}\n```\n")
    for name, ok in checks:
        print(("PASS " if ok else "FAIL ") + name)
    spark.stop()


if __name__ == "__main__":
    main()
