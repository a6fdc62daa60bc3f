from tsflex_spark.sources.io import (
    read_csv,
    read_events,
    read_json,
    read_orc,
    read_parquet,
    read_table,
    write_bucketed,
    write_orc,
    write_partitioned,
)
from tsflex_spark.sources.warc import read_warc, read_wet

__all__ = [
    "read_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "read_table",
    "read_events",
    "read_warc",
    "read_wet",
    "write_partitioned",
    "write_orc",
    "write_bucketed",
]
