from tsflex_spark.datapipe import dedup, multimodal, pipeline, similarity, text

__all__ = ["dedup", "multimodal", "pipeline", "similarity", "text"]
