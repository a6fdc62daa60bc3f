from tsflex_spark.sources.io import read_events, read_parquet, read_table

__all__ = ["read_parquet", "read_table", "read_events"]
