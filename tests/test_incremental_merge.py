"""Incremental merge == full rebuild over the reference-equivalent corpus.

Immutable stats-free segments let merge_new_docs append the new batch and
refresh only term_stats/meta. Reference add_corpus semantics are
path-dependent: a second add_corpus drops docs whose text already exists in
the PRE-EXISTING corpus but keeps within-batch dups
(literal_similarity.py:389-401). So merge(b1, b2) must equal a full rebuild
over b1 + (b2 minus texts present in b1) — which is what this suite asserts
(ids exact, scores to documented ulp tolerance).
"""

import pandas as pd
import pytest

from similarities_spark.config import EngineConfig
from similarities_spark.index.build import BM25IndexBuilder
from similarities_spark.query.engine import BM25QueryEngine
from similarities_spark.sources.synth import synth_webtext_pandas

CFG = EngineConfig(
    stopwords=frozenset({"the"}),
    block_size=16,
    num_term_buckets=4,
    salt_df_threshold=30,
    num_salts=4,
)

QUERIES = ["data web w0003", "of and w0001 w0002", "zzz-none", "w0007 w0009"]


def test_merge_equals_full_rebuild(spark, tmp_path):
    pdf = synth_webtext_pandas(n_docs=180, seed=13, dup_fraction=0.05)
    # plant a cross-boundary duplicate: a batch-2 doc equal to a batch-1 doc
    pdf.loc[150, "text"] = pdf.loc[10, "text"]
    b1_pdf, b2_pdf = pdf.iloc[:100], pdf.iloc[100:]
    batch1 = spark.createDataFrame(b1_pdf)
    batch2 = spark.createDataFrame(b2_pdf)
    # reference-equivalent accumulated corpus: batch-2 rows whose text
    # already exists in batch-1 are dropped; within-batch dups stay
    b1_texts = set(b1_pdf["text"])
    expected_pdf = pd.concat(
        [b1_pdf, b2_pdf[~b2_pdf["text"].isin(b1_texts)]], ignore_index=True
    )
    assert len(expected_pdf) < len(pdf)  # cross-boundary dedup exercised
    full = spark.createDataFrame(expected_pdf)

    builder = BM25IndexBuilder(spark, CFG)
    inc_dir = str(tmp_path / "inc")
    idx1 = builder.build(batch1, inc_dir, input_desc="b1")
    n1 = idx1.n_docs
    merged = builder.merge_new_docs(batch2, inc_dir)
    assert merged.n_docs > n1
    assert merged.meta["increments"][0]["added_docs"] == merged.n_docs - n1

    ref = builder.build(full, str(tmp_path / "full"), input_desc="full")
    assert merged.n_docs == ref.n_docs  # cross-boundary dups dropped once
    assert merged.meta["avgdl"] == ref.meta["avgdl"]
    assert merged.meta["vocab_size"] == ref.meta["vocab_size"]
    assert merged.meta["n_postings"] == ref.meta["n_postings"]
    assert merged.meta["average_idf"] == pytest.approx(
        ref.meta["average_idf"], rel=1e-12
    )

    h_m = BM25QueryEngine(merged).search(QUERIES, topn=10).collect()
    h_f = BM25QueryEngine(ref).search(QUERIES, topn=10).collect()
    key = lambda r: (r["query_id"], r["rank"])
    for rm, rf in zip(sorted(h_m, key=key), sorted(h_f, key=key)):
        assert (rm["query_id"], rm["rank"], rm["doc_id"]) == (
            rf["query_id"],
            rf["rank"],
            rf["doc_id"],
        )
        assert rm["score"] == pytest.approx(rf["score"], rel=1e-12)


def test_merge_all_duplicates_is_noop(spark, tmp_path):
    pdf = synth_webtext_pandas(n_docs=50, seed=17)
    builder = BM25IndexBuilder(spark, CFG)
    d = str(tmp_path / "noop")
    idx = builder.build(spark.createDataFrame(pdf), d, input_desc="x")
    again = builder.merge_new_docs(spark.createDataFrame(pdf), d)
    assert again.n_docs == idx.n_docs
    assert again.meta["avgdl"] == idx.meta["avgdl"]


def _hits(idx, queries=QUERIES, topn=10):
    rows = BM25QueryEngine(idx).search(queries, topn=topn).collect()
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in rows
    )


def test_merge_crash_before_commit_leaves_index_untouched_and_retryable(
    spark, tmp_path
):
    """Crash window 1: everything staged, COMMIT.json not yet written.
    The live index must be byte-identical (stale stats never visible, no
    half-appended docs/blocks) and a RETRIED merge must fully apply the
    batch — not silently no-op against its own partial append."""
    from similarities_spark.index.build import BM25Index

    pdf = synth_webtext_pandas(n_docs=120, seed=23, dup_fraction=0.05)
    b1, b2 = pdf.iloc[:80], pdf.iloc[80:]
    builder = BM25IndexBuilder(spark, CFG)
    d = str(tmp_path / "crash1")
    idx1 = builder.build(spark.createDataFrame(b1), d, input_desc="b1")
    before = _hits(idx1)
    meta_before = dict(idx1.meta)

    with pytest.raises(RuntimeError, match="before commit record"):
        builder.merge_new_docs(
            spark.createDataFrame(b2), d, _fail_before_commit=True
        )
    # live index unchanged: same meta, same query results
    reopened = BM25Index(spark, d)
    assert reopened.n_docs == meta_before["n_docs"]
    assert _hits(reopened) == before

    # retry applies the full batch and equals a clean two-batch merge
    merged = builder.merge_new_docs(spark.createDataFrame(b2), d)
    ref_dir = str(tmp_path / "ref1")
    ref1 = builder.build(spark.createDataFrame(b1), ref_dir, input_desc="b1")
    ref = builder.merge_new_docs(spark.createDataFrame(b2), ref_dir)
    assert merged.n_docs == ref.n_docs
    assert merged.meta["avgdl"] == ref.meta["avgdl"]
    assert _hits(merged) == _hits(ref)


def test_merge_crash_after_commit_record_rolls_forward_on_open(spark, tmp_path):
    """Crash window 2: COMMIT.json written, renames not performed. The next
    open must roll the increment forward (idempotent renames) and observe
    exactly the merged index."""
    from similarities_spark.index.build import BM25Index

    pdf = synth_webtext_pandas(n_docs=120, seed=29, dup_fraction=0.05)
    b1, b2 = pdf.iloc[:80], pdf.iloc[80:]
    builder = BM25IndexBuilder(spark, CFG)
    d = str(tmp_path / "crash2")
    builder.build(spark.createDataFrame(b1), d, input_desc="b1")

    with pytest.raises(RuntimeError, match="after commit record"):
        builder.merge_new_docs(
            spark.createDataFrame(b2), d, _fail_after_commit_record=True
        )
    recovered = BM25Index(spark, d)  # __init__ rolls the increment forward

    ref_dir = str(tmp_path / "ref2")
    builder.build(spark.createDataFrame(b1), ref_dir, input_desc="b1")
    ref = builder.merge_new_docs(spark.createDataFrame(b2), ref_dir)
    assert recovered.n_docs == ref.n_docs
    assert recovered.meta["avgdl"] == ref.meta["avgdl"]
    assert recovered.meta["increments"][0]["added_docs"] == (
        ref.meta["increments"][0]["added_docs"]
    )
    assert _hits(recovered) == _hits(ref)


def test_resume_detects_changed_input_at_same_path(spark, tmp_path):
    """ADVICE r1: resume used to trust stage manifests on existence alone —
    different data at the same logical path must trigger a rebuild, not
    silently serve the stale corpus."""
    pdf_a = synth_webtext_pandas(n_docs=60, seed=31)
    pdf_b = synth_webtext_pandas(n_docs=75, seed=37)
    builder = BM25IndexBuilder(spark, CFG)
    d = str(tmp_path / "stale")
    builder.build(spark.createDataFrame(pdf_a), d, input_desc="same-path")
    # same input_desc, different data -> docs fingerprint (row count) differs
    idx = builder.build(
        spark.createDataFrame(pdf_b), d, resume=True, input_desc="same-path"
    )
    assert idx.n_docs == len(pdf_b)
    ref = builder.build(
        spark.createDataFrame(pdf_b), str(tmp_path / "fresh"), input_desc="fresh"
    )
    assert _hits(idx) == _hits(ref)
