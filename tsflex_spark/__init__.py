"""tsflex_spark — a PySpark-native time-series processing & feature-extraction engine.

Re-expresses the semantics of predict-idlab/tsflex (strided-rolling window
segmentation, feature functions, series pipelines, chunking) on Spark
DataFrame / Catalyst primitives, and extends them with large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) that the single-node reference does not have.

Reference semantics: /root/reference (tsflex v0.4.1). This is NOT a port —
the execution engine is Spark SQL; the reference is cited per-rule in
docstrings as ``file:line`` for parity checking only.

Public surface (deliberate): the tsflex-parity core is re-exported here;
everything else lives under an explicit subpackage, each with its own
``__all__``:

- ``tsflex_spark.features``    — descriptors, FuncWrapper, native catalog
- ``tsflex_spark.processing``  — SeriesProcessor/Pipeline, resample,
  smoothing, downsampling (M4/LTTB), anomaly detection
- ``tsflex_spark.datapipe``    — training-data pipeline: dedup (exact /
  MinHash-LSH / SimHash / SemDeDup / ExactSubstr), similarity & ANN,
  embeddings, text quality & language-ID, BPE, KN-LM, decontamination,
  curation, DSIR, quality classifier, graph (CC/PageRank)
- ``tsflex_spark.streaming``   — Structured-Streaming feature tiers
- ``tsflex_spark.sources``     — parquet/ORC/JSONL/WARC IO + layout sinks
- ``tsflex_spark.relational``  — as-of / range / interval / PIT joins
- ``tsflex_spark.chunking``    — chunk_data / chunk_features
- ``tsflex_spark.utils``       — time args, wide⇄long, validation,
  profiling, drift, skew, scale reports
"""

__version__ = "0.1.0"

from tsflex_spark.chunking import chunk_data
from tsflex_spark.features.feature import FeatureDescriptor, MultipleFeatureDescriptors
from tsflex_spark.features.feature_collection import FeatureCollection
from tsflex_spark.features.function_wrapper import FuncWrapper, make_robust
from tsflex_spark.processing.series_pipeline import SeriesPipeline
from tsflex_spark.processing.series_processor import SeriesProcessor, dataframe_func
from tsflex_spark.relational import asof_join, interval_join, range_join
from tsflex_spark.compat import from_tsflex

__all__ = [
    "FeatureDescriptor",
    "MultipleFeatureDescriptors",
    "FeatureCollection",
    "FuncWrapper",
    "make_robust",
    "SeriesPipeline",
    "SeriesProcessor",
    "dataframe_func",
    "chunk_data",
    "asof_join",
    "interval_join",
    "range_join",
    "from_tsflex",
]
