"""Deterministic synthetic Common-Crawl-style webtext (FIXTURES.md §1).

Schema matches BASELINE.json input_hint:
    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Properties engineered into the corpus (seeded, no wall clock, no downloads):
- Zipfian token frequencies -> head-term skew for salting tests.
- zh + en + mixed docs -> exercises CJK segmentation and stopword filtering.
- exact-text duplicate pairs -> exercises reference ingest semantics
  (reference literal_similarity.py:389-401: within-batch duplicate texts are
  KEPT by add_corpus — the membership check runs against the static
  pre-batch corpus — while a later add_corpus drops cross-batch repeats).
- stopword-only and empty docs -> doc_len 0 after corpus filtering.
- html = b"<html><body>" + text + b"</body></html>" so the byte-identical
  text-extraction invariant is testable.
"""

from __future__ import annotations

import datetime as _dt
from typing import Optional

import numpy as np
import pandas as pd

_EN_VOCAB_SIZE = 2000
_ZH_CHARS = (
    "的一是在不了有和人这中大为上个国我以要他时来用们生到作地于出就分对成会"
    "可主发年动同工也能下过子说产种面而方后多定行学法所民得经十三之进着等部"
)
_EPOCH = _dt.datetime(2023, 1, 1, 0, 0, 0)


def _en_vocab() -> np.ndarray:
    # deterministic pseudo-words: w0000..w1999 plus a few realistic stop-ish words
    common = np.array(
        ["the", "of", "and", "to", "a", "in", "is", "it", "data", "web"], dtype=object
    )
    rest = np.array([f"w{i:04d}" for i in range(_EN_VOCAB_SIZE - len(common))], dtype=object)
    return np.concatenate([common, rest])


def synth_webtext_pandas(
    n_docs: int = 200,
    seed: int = 42,
    dup_fraction: float = 0.05,
    empty_fraction: float = 0.01,
    mean_len: int = 60,
) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    vocab = _en_vocab()
    # Zipf ranks over vocab — head terms appear in a large share of docs
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()

    texts, langs = [], []
    for i in range(n_docs):
        u = rng.rand()
        if u < empty_fraction:
            texts.append("   " if u < empty_fraction / 2 else "")
            langs.append("en")
            continue
        doc_len = max(1, int(rng.poisson(mean_len)))
        lang_pick = rng.rand()
        if lang_pick < 0.25:  # zh: runs of CJK chars with zipfian char choice
            chars = rng.choice(list(_ZH_CHARS), size=doc_len, replace=True)
            texts.append("".join(chars))
            langs.append("zh")
        elif lang_pick < 0.35:  # mixed
            words = rng.choice(vocab, size=doc_len // 2 + 1, p=probs)
            chars = rng.choice(list(_ZH_CHARS), size=doc_len // 2 + 1)
            texts.append(" ".join(words) + " " + "".join(chars))
            langs.append("mixed")
        else:  # en
            words = rng.choice(vocab, size=doc_len, p=probs)
            texts.append(" ".join(words))
            langs.append("en")

    # inject exact duplicates of earlier docs at deterministic positions
    n_dups = int(n_docs * dup_fraction)
    if n_dups and n_docs > 4:
        dup_targets = rng.choice(np.arange(2, n_docs), size=n_dups, replace=False)
        for pos in dup_targets:
            texts[pos] = texts[rng.randint(0, max(1, pos - 1))]

    rows = []
    for i, (text, lang) in enumerate(zip(texts, langs)):
        rows.append(
            {
                "url": f"https://example.org/{seed}/{i:08d}",
                "warc_ts": _EPOCH + _dt.timedelta(seconds=i),
                "html": b"<html><body>" + text.encode("utf-8") + b"</body></html>",
                "text": text,
                "lang": lang,
            }
        )
    return pd.DataFrame(rows)


def synth_webtext_df(spark, n_docs: int = 200, seed: int = 42, **kw):
    """Spark DataFrame flavor; generation is driver-side pandas for small test
    scales. For bench-scale corpora use ``synth_webtext_distributed``."""
    pdf = synth_webtext_pandas(n_docs=n_docs, seed=seed, **kw)
    return spark.createDataFrame(pdf)


def synth_webtext_distributed(spark, n_docs: int, seed: int = 42, partitions: int = 32):
    """Executor-side generation for bench-scale corpora: each partition
    generates its own deterministic slice (seed + partition id), so no
    driver-side materialization and no cross-partition coordination."""
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    per = (n_docs + partitions - 1) // partitions

    def gen(pidx_iter):
        for row in pidx_iter:
            p = row.id
            lo = p * per
            hi = min(n_docs, lo + per)
            if lo >= hi:
                continue
            pdf = synth_webtext_pandas(n_docs=hi - lo, seed=seed + 10_007 * p)
            # re-key url/warc_ts into the global namespace so urls stay unique
            pdf["url"] = [
                f"https://example.org/{seed}/{i:010d}" for i in range(lo, hi)
            ]
            pdf["warc_ts"] = [
                _EPOCH + _dt.timedelta(seconds=i) for i in range(lo, hi)
            ]
            for r in pdf.itertuples(index=False):
                ts = r.warc_ts.to_pydatetime() if hasattr(r.warc_ts, "to_pydatetime") else r.warc_ts
                yield (r.url, ts, r.html, r.text, r.lang)

    base = spark.range(partitions).repartition(partitions, "id")
    return spark.createDataFrame(base.rdd.flatMap(lambda r: gen([r])), schema)


def synth_media_pandas(n_rows: int = 50, seed: int = 42, frames_max: int = 6):
    """Deterministic synthetic media table with REAL payloads:
        (media_id:int64, image:binary PNG or baseline JPEG,
         audio:binary WAV PCM,
         video:binary MJPEG or concatenated-PNG frame stream)
    Formats alternate by media_id (even: PNG / PNG-stream, odd: JPEG /
    MJPEG) so every pipeline over this table exercises the mixed-format
    dispatch. Each payload derives from a seeded per-row key via the
    stdlib codecs in functions/mediacodec.py + jpegcodec.py, so tests and
    oracles can re-derive the exact bytes driver-side with no media
    libraries."""
    from similarities_spark.functions import mediacodec as mc

    rows = {"media_id": [], "image": [], "audio": [], "video": []}
    for i in range(n_rows):
        key = f"{seed}|{i}".encode("utf-8")
        enc = mc.png_from_bytes if i % 2 == 0 else mc.jpeg_from_bytes
        rows["media_id"].append(i)
        rows["image"].append(enc(key))
        rows["audio"].append(mc.wav_from_bytes(key))
        n_frames = 1 + (i % frames_max)
        rows["video"].append(
            b"".join(
                enc(key + b"|frame|%d" % f) for f in range(n_frames)
            )
        )
    return pd.DataFrame(rows)


def synth_media_df(spark, n_rows: int = 50, seed: int = 42, **kw):
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("image", BinaryType()),
            StructField("audio", BinaryType()),
            StructField("video", BinaryType()),
        ]
    )
    pdf = synth_media_pandas(n_rows=n_rows, seed=seed, **kw)
    return spark.createDataFrame(pdf, schema)
