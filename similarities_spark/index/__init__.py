from similarities_spark.index.build import BM25Index, BM25IndexBuilder
from similarities_spark.index import codec

__all__ = ["BM25Index", "BM25IndexBuilder", "codec"]
