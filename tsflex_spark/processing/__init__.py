from tsflex_spark.processing.series_processor import SeriesProcessor, dataframe_func
from tsflex_spark.processing.series_pipeline import SeriesPipeline
from tsflex_spark.processing.anomaly import (
    anomaly_seasonal,
    anomaly_zscore,
    cusum,
    seasonal_profile,
)
from tsflex_spark.processing.downsample import lttb, m4, minmax_preselect
from tsflex_spark.processing.resample import resample_interpolate
from tsflex_spark.processing.smoothing import ewma
from tsflex_spark.processing.utils import process_chunks_multithreaded

__all__ = [
    "SeriesProcessor",
    "SeriesPipeline",
    "anomaly_seasonal",
    "anomaly_zscore",
    "cusum",
    "seasonal_profile",
    "dataframe_func",
    "ewma",
    "lttb",
    "m4",
    "minmax_preselect",
    "process_chunks_multithreaded",
    "resample_interpolate",
]
