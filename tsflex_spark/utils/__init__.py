from tsflex_spark.utils.time_args import parse_time_arg, timedelta_to_str, to_numeric_units
from tsflex_spark.utils.data import DataType, determine_type, long_to_wide, wide_to_long
from tsflex_spark.utils.drift import categorical_drift, feature_drift
from tsflex_spark.utils.plans import scale_report
from tsflex_spark.utils.profile import diff_snapshots, profile_columns
from tsflex_spark.utils.validate import (
    check_rules,
    duplicate_keys,
    expect,
    in_range,
    matches,
    not_null,
    observe_rules,
)
from tsflex_spark.utils.semistructured import (
    flatten_struct,
    infer_json_schema,
    json_field,
    parse_json_col,
)
from tsflex_spark.utils.skew import (
    approx_heavy_hitters,
    key_skew_stats,
    salted_collect_list,
    salted_join,
    salted_join_hot,
)

__all__ = [
    "parse_time_arg",
    "timedelta_to_str",
    "to_numeric_units",
    "DataType",
    "determine_type",
    "long_to_wide",
    "wide_to_long",
    "categorical_drift",
    "feature_drift",
    "scale_report",
    "diff_snapshots",
    "profile_columns",
    "check_rules",
    "duplicate_keys",
    "expect",
    "in_range",
    "matches",
    "not_null",
    "observe_rules",
    "flatten_struct",
    "infer_json_schema",
    "json_field",
    "parse_json_col",
    "approx_heavy_hitters",
    "key_skew_stats",
    "salted_collect_list",
    "salted_join",
    "salted_join_hot",
]
