from tsflex_spark.datapipe import curation, dedup, multimodal, pipeline, similarity, text

__all__ = ["curation", "dedup", "multimodal", "pipeline", "similarity", "text"]
