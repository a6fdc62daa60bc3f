from tsflex_spark.datapipe import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
