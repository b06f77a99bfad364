from similarities_spark.functions import textops, dedup, ann, distances

__all__ = ["textops", "dedup", "ann", "distances"]
