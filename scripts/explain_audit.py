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

    # 3) oracle postings view (explode -> agg; the ENGINE path is section 5)
    post = E.q_bm25_postings(spark, sf_dir)
    sections.append(("oracle postings view (explode -> partial+final agg)", grab_plan(post)))

    # 4) cosine topk (broadcast of queries)
    cos = E.q_cosine_topk(spark, sf_dir)
    sections.append(("cosine top-k (broadcast queries x scan)", grab_plan(cos)))

    # 5) ENGINE build path (fused): the whole tokenize->explode->salt->encode
    # pipeline must contain exactly ONE all-to-all Exchange (the groupBy
    # (term, salt) into the block encoder; the broadcast of the heavy-term
    # list is a BroadcastExchange, not a shuffle)
    from similarities_spark.index.build import (
        BM25IndexBuilder,
        _encode_blocks_df,
    )

    builder = BM25IndexBuilder(spark, idx.config())
    # audit the SCALE-path plan explicitly: 'auto' resolves by batch size
    # at build time, but the 100-TB shape is always fused_tf
    tok_df, exploded = builder._tokenized_exploded(idx.docs(), mode="fused_tf")
    # literal heavy list: in production this is a vocab-sized partial-agg
    # side plan feeding the SAME BroadcastExchange — substituting a literal
    # isolates the postings-row path so the check below counts only the
    # exchanges the posting rows themselves travel through
    heavy = spark.createDataFrame([("the", True)], "term string, _heavy boolean")
    per_salt = builder.cfg.salt_bounds(idx.n_docs)
    salted = (
        exploded.join(F.broadcast(heavy), "term", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("_heavy").isNotNull(),
                (F.col("doc_id") / F.lit(per_salt)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_heavy")
    )
    enc = _encode_blocks_df(salted, builder.cfg)
    engine_build_plan = grab_plan(enc)
    tok_df.unpersist()
    sections.append(
        ("ENGINE fused build (tokenize->explode->salt->encode)", engine_build_plan)
    )

    # 5b) term_stats lookup: the per-batch stats read must push its term
    # IN-list into the parquet scan (the table is written range-partitioned
    # + sorted by term, so the pushed filter prunes row groups)
    st = idx.term_stats().filter(F.col("term").isin(["dup", "key"]))
    sections.append(("term_stats lookup (term IN pushdown)", grab_plan(st)))

    # 6) distributed join query path (search_join_df): query terms must
    # arrive at term_stats/blocks via JOINS of the queries DataFrame — no
    # driver-staged literal term list in the plan
    qdf = spark.createDataFrame(
        [(0, "dup key scan")], "query_id long, text string"
    )
    jp_hits = engine.search_join_df(qdf, topn=10)
    sections.append(
        ("distributed join query path (search_join_df)", grab_plan(jp_hits))
    )

    # 7) term-centric path (search_term_centric_df): each (term, block)
    # decoded once per batch. The plan must broadcast the vocab-sized
    # per-term values into the blocks scan (no blocks shuffle before the
    # decode kernel), truncate per-query top-k via WindowGroupLimit, and
    # read only the decode columns from blocks (no tf_max/dl metadata —
    # there is no MaxScore pruning on this path, so the metadata columns
    # must be pruned from the scan entirely).
    tc_hits = engine.search_term_centric_df(qdf, topn=10)
    sections.append(
        ("term-centric query path (search_term_centric_df)", grab_plan(tc_hits))
    )

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
    checks.append(("oracle postings agg is partial+final hash agg",
                   pp.count("HashAggregate") >= 2))
    checks.append(("oracle postings plan uses whole-stage codegen",
                   "*(1)" in pp or "WholeStageCodegen" in pp))
    cp = sections[3][1]
    checks.append(("cosine uses broadcast join", "Broadcast" in cp))
    ep = sections[4][1]
    # count shuffles in the SIMPLE-mode section (one line per node, args
    # inline: "Exchange hashpartitioning(...)"); BroadcastExchange (the
    # heavy-term list) is not an all-to-all and is excluded by the pattern
    parts = ep.split("== Physical Plan ==")
    fmt = parts[-1]  # simple-mode plan (grab_plan appends it last)
    n_shuffles = fmt.count("Exchange hashpartitioning") + fmt.count(
        "Exchange rangepartitioning"
    )
    checks.append(
        ("ENGINE fused build has exactly ONE all-to-all exchange "
         f"(found {n_shuffles})", n_shuffles == 1)
    )
    checks.append(("ENGINE fused build has no pre-encode hash aggregate",
                   "HashAggregate" not in fmt and "SortAggregate" not in fmt))
    # map-side TF: the run-length pass must be staged (ONE array_sort
    # in the formatted plan — CollapseProject re-inlining it would
    # re-sort per element inside the lambdas, quadratic per doc)
    fmt_full = parts[1] if len(parts) > 2 else ep
    n_sorts = fmt_full.count("array_sort")
    checks.append(
        ("fused_tf map-side TF staged (exactly one array_sort, "
         f"found {n_sorts})", n_sorts == 1)
    )
    sp = sections[5][1]
    checks.append(
        ("term_stats lookup pushes term IN-list to parquet scan",
         "In(term, [dup,key])" in sp or "In(term," in sp)
    )
    jp = sections[6][1]
    # the driver-adjacent path ships stats as a literal table and never
    # scans term_stats; the join path must instead show a real term_stats
    # parquet scan feeding a join — proof that no per-query driver staging
    # happened (the plan's scan Locations name the index directories)
    checks.append(
        ("join query path joins the term_stats scan (no driver staging)",
         "term_stats" in jp and "Join" in jp)
    )
    tp = sections[7][1]
    checks.append(
        ("term-centric path broadcasts term values into blocks scan",
         "BroadcastHashJoin" in tp)
    )
    checks.append(
        ("term-centric top-k truncation compiles to WindowGroupLimit",
         "WindowGroupLimit" in tp)
    )
    checks.append(
        ("term-centric blocks scan prunes MaxScore metadata columns",
         "tf_max" not in tp and "dl_max" not in tp)
    )
    checks.append(
        ("term-centric path scans term_stats distributed (no driver staging)",
         "term_stats" in tp and "Join" in tp)
    )

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
