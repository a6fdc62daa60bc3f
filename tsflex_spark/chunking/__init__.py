from tsflex_spark.chunking.chunking import chunk_data

__all__ = ["chunk_data"]
