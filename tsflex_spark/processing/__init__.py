from tsflex_spark.processing.series_processor import SeriesProcessor, dataframe_func
from tsflex_spark.processing.series_pipeline import SeriesPipeline

__all__ = ["SeriesProcessor", "SeriesPipeline", "dataframe_func"]
