from tsflex_spark.utils.time_args import parse_time_arg, timedelta_to_str, to_numeric_units
from tsflex_spark.utils.data import DataType, determine_type, long_to_wide, wide_to_long

__all__ = [
    "parse_time_arg",
    "timedelta_to_str",
    "to_numeric_units",
    "DataType",
    "determine_type",
    "long_to_wide",
    "wide_to_long",
]
