"""Deduplication operators for training-data pipelines, Spark-first.

Five tiers, cheapest to richest (all shuffle-on-key, no cross joins except
where a candidate-pair generator bounds the pair set first):

- exact_dedup            : hash-groupBy on full text (or fingerprint)
- ngram_jaccard_pairs    : n-gram Jaccard via shingle inverted join
                           (the candidate generator IS the shingle join —
                           only pairs sharing >=1 shingle are ever formed;
                           exact below the boilerplate-shingle cap)
- minhash_lsh_pairs      : MinHash banding — the 100TB-scale approximate
                           path; candidates = bucket-join on band signature
- simhash64              : 64-bit SimHash fingerprints (near-dup hamming)
- embedding near-dup     : see functions/ann.py (cosine threshold join)

MD5 is used as the portable hash everywhere (identical hex output in Spark,
DuckDB, Python) so oracles can replicate results bit-for-bit.
"""

from __future__ import annotations

import logging
from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

from similarities_spark.functions.textops import spread_small_input, tokens_col

logger = logging.getLogger(__name__)


def _cap_buckets(
    rows: DataFrame,
    key_cols: list,
    max_bucket_size: Optional[int],
    what: str,
) -> DataFrame:
    """Drop candidate buckets larger than ``max_bucket_size`` (a degenerate
    bucket — boilerplate pages, all-zero chunks — goes quadratic in the
    pair join). Results become approximate ONLY for members of the dropped
    buckets, which at web scale are boilerplate you usually want gone
    anyway. ``None`` disables the cap.

    Implemented as a bucket-count window (one exchange on ``key_cols``, no
    separate sizing job, no anti-join): the window's hash partitioning on
    the bucket key is exactly the partitioning the candidate self-join
    downstream needs, so the pair join on the capped rows adds NO further
    exchange (guide §2.4 "two operations keyed the same way share one
    exchange"). The previous shape (groupBy sizes -> eager count() -> join
    left_anti) cost an extra full pass over the rows plus a second shuffle
    purely to log the dropped-bucket count."""
    if max_bucket_size is None:
        return rows
    w = Window.partitionBy(*key_cols)
    return (
        rows.withColumn("_bn", F.count(F.lit(1)).over(w))
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep-first exact-text dedup (reference add_corpus semantics,
    literal_similarity.py:394,399): one row per distinct text, lowest id wins.
    Scale note: groupBy on md5(text) — 16-byte keys, not full documents."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate clusters: (fp, n_copies, keep_id) for groups size>1."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


def shingles_df(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct n-gram shingles per doc: (id, shingle). Built with JVM array
    ops (transform/sequence/slice) — no Python UDF.

    Plan hygiene (same lesson as build._doc_tf_entries): the token array is
    materialized in its OWN projection before the shingle transform. The
    higher-order lambdas are interpreted, so an inlined tokens expression
    would re-run regexp_extract_all once per shingle position — measured
    ~18x the whole stage cost (4.4s -> 0.24s on the sf0.1 corpus noop).
    CollapseProject keeps the multi-referenced non-cheap alias staged."""
    df = spread_small_input(df)
    toked = df.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)) - 0),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    # docs shorter than n tokens produce their whole text as one shingle
    sh = F.when(F.size(toks) >= n, sh).otherwise(
        F.array(F.concat_ws(" ", toks))
    )
    return toked.select(
        "id", F.explode(F.array_distinct(sh)).alias("shingle")
    ).where(F.col("shingle") != "")


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_docs: Optional[int] = 1000,
) -> DataFrame:
    """n-gram Jaccard similarity via shingle inverted-index self-join.

    Exact for every pair whose shared shingles are all under the
    ``max_shingle_docs`` cap (the common case — see the cap note below);
    pass ``max_shingle_docs=None`` for unconditionally exact output at the
    cost of a possibly quadratic join on boilerplate shingles.

    Plan: shingle inverted index self-join (equi-join on shingle — the
    shuffle key), count intersections per pair, then |A|+|B|-inter for the
    union. Never forms non-overlapping pairs, so the blow-up is bounded by
    shingle co-occurrence, not n^2.

    ``max_shingle_docs`` caps the self-join fan-out: a boilerplate shingle
    shared by d docs contributes d^2/2 pairs (one shingle in 10^5 docs =
    10^10 pairs), so shingles held by more docs than the cap are dropped
    from CANDIDATE GENERATION (logged). Pair sizes |A|/|B| still count every
    shingle, so scores stay exact for pairs whose shared shingles are all
    under the cap; a pair sharing a dropped shingle either undercounts its
    intersection or (if that was its only overlap) is not emitted. ``None``
    disables the cap (see minhash_lsh_pairs for the truly-huge path).
    """
    sh = shingles_df(df, n=n, text_col=text_col, id_col=id_col).persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    capped = _cap_buckets(sh, ["shingle"], max_shingle_docs, "ngram_jaccard_pairs")
    a = capped.alias("a")
    bdf = capped.alias("b")
    inter = (
        a.join(bdf, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "sh_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sh_a") + F.col("sh_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per doc: for seed s, sig_s = min over shingles of
    md5(s || shingle) (fixed-width hex => lexicographic == numeric order).
    Output: (id, seed, sig). Portable: any engine with md5 reproduces it."""
    sh = shingles_df(df, n=n, text_col=text_col, id_col=id_col)
    seeds = F.explode(
        F.array(*[F.lit(s) for s in range(num_hashes)])
    ).alias("seed")
    return (
        sh.select("id", "shingle", seeds)
        .withColumn(
            "h", F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle")))
        )
        .groupBy("id", "seed")
        .agg(F.min("h").alias("sig"))
    )


def minhash_wide(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """One row per doc with num_hashes signature COLUMNS: the shingle rows
    are aggregated once (16 min() aggregates) instead of exploded x16 —
    same hash work, 16x less shuffle volume. Signatures identical to
    minhash_signatures (min over md5(seed|shingle) hex).

    ``hash_fn``: 'md5' (default) — portable hex, reproducible in DuckDB /
    Python for the oracle entries. 'xxhash64' — the PRODUCTION mode: the
    JVM's 64-bit xxHash with the seed mixed in as a leading literal column,
    several-fold cheaper than 16 md5 digests per shingle (md5 is the
    dominant cost of the whole minhash phase); signature values differ from
    md5 mode but the minhash estimator's statistics are the same, so pair
    sets at matched thresholds agree (pytest-gated)."""
    sh = shingles_df(df, n=n, text_col=text_col, id_col=id_col)
    if hash_fn == "md5":
        aggs = [
            F.min(
                F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle")))
            ).alias(f"sig{s}")
            for s in range(num_hashes)
        ]
    elif hash_fn == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.lit(s), F.col("shingle"))).alias(f"sig{s}")
            for s in range(num_hashes)
        ]
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r} (md5 | xxhash64)")
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: Optional[int] = 1000,
    hash_fn: str = "md5",
) -> DataFrame:
    """LSH banding over MinHash signatures: docs agreeing on ALL rows of any
    band become candidate pairs (est_jaccard = fraction of matching hashes).

    This is the web-scale near-dup path: cost is a groupBy on (band, band
    signature) + per-bucket pairing — no shingle self-join, no n^2.
    Signatures ride as wide columns (minhash_wide); only the small banded
    projection is exploded for the bucket join. ``hash_fn='xxhash64'`` is
    the production mode (see minhash_wide): same banding statistics at a
    fraction of the hashing cost; 'md5' stays the oracle-portable default.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_wide(
        df, num_hashes=num_hashes, n=n, text_col=text_col, id_col=id_col,
        hash_fn=hash_fn,
    ).persist()
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                "_",  # unambiguous for numeric xxhash64 sigs; md5 sigs are
                # fixed-width hex so the separator never changes grouping
                F.sort_array(
                    F.array(
                        *[
                            F.col(f"sig{s}").cast("string")
                            for s in range(
                                bi * rows_per_band, (bi + 1) * rows_per_band
                            )
                        ]
                    )
                ),
            ).alias("band_sig"),
        )
        for bi in range(bands)
    ]
    banded = sigs.select(
        "id", F.explode(F.array(*band_cols)).alias("bs")
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))
    banded = _cap_buckets(
        banded, ["band", "band_sig"], max_bucket_size, "minhash_lsh_pairs"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    match_sum = None
    for s in range(num_hashes):
        term = (F.col(f"a.sig{s}") == F.col(f"b.sig{s}")).cast("int")
        match_sum = term if match_sum is None else match_sum + term
    est = (
        cand.join(sigs.alias("a"), F.col("a.id") == F.col("id_a"))
        .join(sigs.alias("b"), F.col("b.id") == F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (match_sum / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
    )
    return est


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash from md5 of tokens (tf-weighted bit votes), matching
    the reference's weighted-feature design (literal_similarity.py:88-117)
    but with a portable md5 bit source instead of its custom string_hash.

    Pure Catalyst: explode tokens -> tf weights -> per-bit vote aggregation
    over the md5 hex prefix decoded into two 32-bit halves (16 hex digits =
    64 bits). Output (id, simhash: bigint as unsigned-interpreted long).

    Expression-tree hygiene: the hex prefix is converted ONCE into two long
    halves (conv base 16), each per-bit vote is a flat
    sum((bit*2 - 1) * tf) over a single shift-and-mask of the proper half,
    and the 64 vote signs reassemble through conv(base 2) of two 32-bit
    binary strings instead of a 64-deep nested Add chain. Same integer
    math bit for bit as the instr/substring formulation it replaces
    (vote_j = sum over tokens of +-tf; bit j set iff vote_j > 0), but the
    plan tree is ~4x smaller — Catalyst analysis/optimization of the old
    tree cost more driver time than the whole aggregation job.
    """
    df = spread_small_input(df)
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.substring(F.md5(F.col("tok")), 1, 16))
        .withColumn("_hi", F.conv(F.substring("h", 1, 8), 16, 10).cast("long"))
        .withColumn("_lo", F.conv(F.substring("h", 9, 8), 16, 10).cast("long"))
    )
    # vote for bit j: +tf if bit set else -tf. Bit j (MSB-first over the 16
    # hex digits) = bit (31 - j%32) of the j<32 ? hi : lo half.
    votes = []
    for j in range(64):
        half = F.col("_hi") if j < 32 else F.col("_lo")
        bit = F.shiftrightunsigned(half, 31 - (j % 32)).bitwiseAND(F.lit(1))
        votes.append(F.sum((bit * 2 - 1) * F.col("tf")).alias(f"v{j}"))
    agg = toks.groupBy("id").agg(*votes)
    # reassemble: bit (63-j) of the result is set iff v_j > 0 — build each
    # 32-bit half as a binary string, conv to long, and recombine; identical
    # two's-complement value to summing signed bit weights
    half_bits = [
        F.concat(
            *[
                F.when(F.col(f"v{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
                for j in range(off, off + 32)
            ]
        )
        for off in (0, 32)
    ]
    hi = F.conv(half_bits[0], 2, 10).cast("long")
    lo = F.conv(half_bits[1], 2, 10).cast("long")
    return agg.select("id", F.shiftleft(hi, 32).bitwiseOR(lo).alias("simhash"))


def simhash_hamming_pairs(
    sim_df: DataFrame,
    max_hamming: int = 8,
    max_bucket_size: Optional[int] = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.
    Candidate generation: block on 4 x 16-bit chunks (a pair within hamming
    8 of 64 bits must agree exactly on >=1 of 8 8-bit chunks in expectation;
    we use 16-bit chunks, exact for max_hamming<=3 per pigeonhole with 4
    chunks, approximate above). bit_count(a XOR b) verifies exactly."""
    chunks = sim_df.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), c * 16).bitwiseAND(
                            F.lit(0xFFFF)
                        ).alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("id", "simhash", F.col("ch.chunk").alias("chunk"), F.col("ch.val").alias("val"))
    chunks = _cap_buckets(
        chunks, ["chunk", "val"], max_bucket_size, "simhash_hamming_pairs"
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def duplicate_passage_pairs(
    df: DataFrame,
    width: int = 8,
    stride: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs_per_shingle: Optional[int] = 1000,
) -> DataFrame:
    """Passage-level (sub-document) duplicate detection: docs sharing at
    least one complete ``width``-token window sampled every ``stride``
    tokens. The passage analog of exact dedup — catches boilerplate reuse
    and training-data contamination that document-level hashing misses
    (the reference has no sub-document operator; this extends its dedup
    family the way a 100 TB corpus pipeline needs).

    Plan shape (all codegen, no HOF lambdas over computed arrays):
      posexplode tokens -> explode a WIDTH/STRIDE-sized literal offset
      array (each token belongs to <= ceil(width/stride) windows) ->
      groupBy (doc, window start) rebuilds each shingle ONCE ->
      self-join on (xxhash64(shingle), shingle) bounded by the
      degenerate-shingle cap -> per-pair distinct-shingle counts.
    Candidate volume is bounded by shingle co-occurrence (never all-pairs);
    a boilerplate shingle shared by > ``max_docs_per_shingle`` docs is
    dropped and logged (exact same cap semantics as the LSH/simhash ops).

    Returns (doc_a, doc_b, shared_shingles), doc_a < doc_b.
    """
    m = -(-width // stride)  # windows covering one position
    df = spread_small_input(df)
    toked = df.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("toks")
    )
    exploded = toked.select(
        "doc_id",
        F.size("toks").alias("n"),
        F.posexplode("toks").alias("pos", "term"),
    )
    member = (
        exploded.select(
            "doc_id",
            "n",
            "pos",
            "term",
            F.explode(F.array(*[F.lit(j) for j in range(m)])).alias("j"),
        )
        .withColumn(
            "start",
            F.col("pos") - (F.col("pos") % F.lit(stride)) - F.col("j") * F.lit(stride),
        )
        .filter(
            (F.col("start") >= 0)
            & (F.col("pos") < F.col("start") + F.lit(width))
            # complete windows only (matches the oracle's generate_series cap)
            & (F.col("start") <= F.col("n") - F.lit(width))
        )
    )
    shingles = (
        member.groupBy("doc_id", "start")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "term"))),
                    lambda x: x["term"],
                ),
            ).alias("shingle")
        )
        .select("doc_id", "shingle")
        .distinct()  # a doc contributes each distinct passage once
    )
    shingles = _cap_buckets(
        shingles, ["shingle"], max_docs_per_shingle, "duplicate_passage_pairs"
    ).withColumn("h", F.xxhash64("shingle"))
    a, b = shingles.alias("a"), shingles.alias("b")
    return (
        a.join(b, ["h", "shingle"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_shingles"))
    )
