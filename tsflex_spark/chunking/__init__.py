from tsflex_spark.chunking.chunking import chunk_data, chunk_features

__all__ = ["chunk_data", "chunk_features"]
