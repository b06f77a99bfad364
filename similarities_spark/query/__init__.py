from similarities_spark.query.engine import BM25QueryEngine

__all__ = ["BM25QueryEngine"]
