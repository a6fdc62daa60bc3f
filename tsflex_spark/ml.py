"""MLlib pipeline integration — tsflex_spark stages inside ``pyspark.ml.Pipeline``.

The reference once shipped an sklearn ``TransformerMixin`` wrapper so its
pipelines could sit inside sklearn composition; the Spark-native analog is
an MLlib ``Transformer``: a ``SeriesPipeline`` (preprocessing) and a
``FeatureCollection`` (feature extraction) become pipeline stages that
compose with any MLlib estimator (scaler, KMeans, GBT, ...) in one
``Pipeline(stages=[...])`` — fit/save/load and param handling included.

Both wrappers are thin: ``_transform`` delegates to ``process``/
``calculate``, so the full plan (native aggregates, two-level rewrite,
Arrow tiers) still compiles into the surrounding pipeline's DataFrame
lineage lazily — an MLlib estimator downstream triggers one fused job.

GOTCHA: MLlib's RDD-backed components (e.g.
``BinaryClassificationEvaluator``) serialize the feature frame's plan
into task closures, and the sparsity watcher's ``DataFrame.observe``
metric node is not serializable there — pass
``approve_sparsity=True`` to ``calculate`` (or eagerly checkpoint the
feature frame) before feeding MLlib evaluators.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.ml import Transformer
from pyspark.sql import DataFrame

from tsflex_spark.features.feature_collection import FeatureCollection
from tsflex_spark.processing.series_pipeline import SeriesPipeline


class SeriesPipelineTransformer(Transformer):
    """``SeriesPipeline.process`` as an MLlib pipeline stage."""

    def __init__(
        self,
        pipeline: SeriesPipeline,
        ts_col: str = "ts",
        key_cols: Sequence[str] = (),
        return_all_series: bool = True,
        drop_keys: Optional[Sequence[str]] = None,
    ):
        super().__init__()
        self.pipeline = pipeline
        self.ts_col = ts_col
        self.key_cols = list(key_cols)
        self.return_all_series = return_all_series
        self.drop_keys = list(drop_keys) if drop_keys else None

    def _transform(self, dataset: DataFrame) -> DataFrame:
        kwargs = dict(
            ts_col=self.ts_col,
            key_cols=self.key_cols,
            return_all_series=self.return_all_series,
        )
        if self.drop_keys:
            kwargs["drop_keys"] = self.drop_keys
        return self.pipeline.process(dataset, **kwargs)


class FeatureCollectionTransformer(Transformer):
    """``FeatureCollection.calculate`` as an MLlib pipeline stage.

    The output is the feature frame (one row per output index / key),
    ready for ``VectorAssembler`` + any estimator downstream.
    """

    def __init__(
        self,
        collection: FeatureCollection,
        ts_col: str = "ts",
        key_cols: Sequence[str] = (),
        window_idx: str = "end",
        include_final_window: bool = False,
        bound_method: str = "inner",
        approve_sparsity: bool = True,
    ):
        super().__init__()
        self.collection = collection
        self.ts_col = ts_col
        self.key_cols = list(key_cols)
        self.window_idx = window_idx
        self.include_final_window = include_final_window
        self.bound_method = bound_method
        # default True here: inside an ML pipeline there is no user at the
        # terminal to act on the gap warning, and the observe watcher
        # would outlive the stage
        self.approve_sparsity = approve_sparsity

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self.collection.calculate(
            dataset,
            ts_col=self.ts_col,
            key_cols=self.key_cols,
            window_idx=self.window_idx,
            include_final_window=self.include_final_window,
            bound_method=self.bound_method,
            approve_sparsity=self.approve_sparsity,
        )
