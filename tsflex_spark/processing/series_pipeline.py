"""SeriesPipeline — ordered composition of SeriesProcessors.

Parity: reference tsflex/processing/series_pipeline.py:22-245. Each step
sees all prior outputs (wide-frame ``withColumn`` add-or-replace ≙ the
reference's ``series_dict.update``); Spark's lazy evaluation turns the whole
pipeline into ONE Catalyst plan — column-tier steps fuse into a single
whole-stage-codegen projection.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame

from tsflex_spark.processing.series_processor import SeriesProcessor


class _ProcessingError(Exception):
    pass


class SeriesPipeline:
    def __init__(self, processors: Optional[Sequence[Union[SeriesProcessor, "SeriesPipeline"]]] = None):
        self.processing_steps: List[SeriesProcessor] = []
        if processors:
            for p in processors:
                self.append(p)

    def get_required_series(self) -> List[str]:
        out: dict = {}
        for step in self.processing_steps:
            for s in step.get_required_series():
                out.setdefault(s)
        return list(out)

    def append(self, processor: Union[SeriesProcessor, "SeriesPipeline"]) -> "SeriesPipeline":
        if isinstance(processor, SeriesPipeline):
            self.processing_steps.extend(processor.processing_steps)
        else:
            self.processing_steps.append(processor)
        return self

    def insert(self, idx: int, processor: SeriesProcessor) -> "SeriesPipeline":
        self.processing_steps.insert(idx, processor)
        return self

    def process(
        self,
        data: DataFrame,
        *,
        ts_col: str = "ts",
        key_cols: Sequence[str] = (),
        return_all_series: bool = True,
        drop_keys: Sequence[str] = (),
        logging_file_path: Optional[str] = None,
    ) -> DataFrame:
        from tsflex_spark.utils.logging import log_execution

        df = data
        if not return_all_series:
            keep = set(self.get_required_series()) | {ts_col, *key_cols}
            df = df.select(*[c for c in df.columns if c in keep])
        for step in self.processing_steps:
            name = getattr(step.function, "__name__", type(step.function).__name__)
            series = "|".join(step.get_required_series())
            try:
                # one log line per processing step (reference
                # processing/logger.py get_processor_logs surface); Spark
                # is lazy, so the duration is the step's plan-build time
                with log_execution(name, series, "-", "-", series, logging_file_path):
                    df = step(df, ts_col, key_cols)
            except Exception as exc:  # reference wraps step errors (:212-221)
                raise _ProcessingError(f"error in step {step!r}: {exc}") from exc
        if drop_keys:
            df = df.drop(*drop_keys)
        return df

    def serialize(self, path: str) -> None:
        from pyspark import cloudpickle

        with open(path, "wb") as fh:
            cloudpickle.dump(self, fh)

    @staticmethod
    def deserialize(path: str) -> "SeriesPipeline":
        from pyspark import cloudpickle

        with open(path, "rb") as fh:
            obj = cloudpickle.load(fh)
        assert isinstance(obj, SeriesPipeline)
        return obj

    def __repr__(self) -> str:
        return "SeriesPipeline(\n" + "\n".join(f"  {p!r}" for p in self.processing_steps) + "\n)"
