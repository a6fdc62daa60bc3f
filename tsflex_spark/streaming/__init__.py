"""Structured-Streaming tier: tumbling/sliding/session windowed features
(`rolling.py`) and custom stateful operators via
``applyInPandasWithState`` (`stateful.py`). Batch↔stream parity is
test-locked in ``tests/test_streaming*.py``."""

from tsflex_spark.streaming.rolling import (
    rolling_features_stream,
    session_features_stream,
)
from tsflex_spark.streaming.stateful import (
    ewma_stream,
    running_stats_stream,
    session_features_stream_udf,
    windowed_features_stream,
)

__all__ = [
    "rolling_features_stream",
    "session_features_stream",
    "ewma_stream",
    "running_stats_stream",
    "windowed_features_stream",
    "session_features_stream_udf",
]
