"""Rolling anomaly detection over time-series events.

``anomaly_zscore`` flags points that deviate from their own TRAILING
window: for each event, mean/std over ``[t - window, t)`` of the same
key (the current point is excluded — it must not vote on its own
baseline), then ``z = (x - mean) / std``. This is the standard
production anomaly primitive (stream monitors, sensor QA, rate-limit
detectors) and composes the engine's TIME semantics: windows are
micros-range frames, keys distribute, everything is Catalyst window
aggregation — no Python.

Scale notes:
- Per key the plan is ONE window exchange (``partitionBy(keys)
  .orderBy(tsn).rangeBetween(-w, -1)``) with all three aggregates
  sharing the frame — Spark evaluates them in a single pass.
- UNKEYED input would put the whole table in one WindowExec partition
  (the classic single-task trap — see utils/distributed). The API
  therefore REQUIRES key_cols; for truly global series, segment first
  (e.g. ``chunk_data``) or use ``processing.ewma`` + residuals, which
  has a distributed global path.
- Streaming: a trailing-range window is not expressible in Structured
  Streaming's append model; the streaming analog is
  ``streaming.stateful.running_stats_stream`` (O(1) state per key) —
  flag on its running mean/std instead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsflex_spark.utils.time_args import parse_time_arg, ts_micros


def anomaly_zscore(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window: str,
    key_cols: Sequence[str],
    min_points: int = 5,
    threshold: float = 3.0,
    ddof: int = 0,
) -> DataFrame:
    """Add ``mean_w``, ``std_w``, ``zscore``, ``is_anomaly`` columns.

    ``zscore`` is NULL when the trailing window holds fewer than
    ``min_points`` points or has zero variance (cold start / constant
    baseline — not enough evidence to call anything anomalous, the
    conservative production default). ``window`` is a time-string
    (``"5 minutes"``, ``"1h"``); ``ddof`` picks population (0) or
    sample (1) std.
    """
    key_cols = list(key_cols)
    if not key_cols:
        raise ValueError(
            "anomaly_zscore requires key_cols: an unkeyed trailing window "
            "is a single-partition WindowExec — segment the series first "
            "(chunk_data) or use processing.ewma residuals"
        )
    w_us = int(parse_time_arg(window).value // 1000)  # ns → µs
    d = df.withColumn("__tsn", ts_micros(ts_col))
    x = F.col(value_col).cast("double")
    win = (
        Window.partitionBy(*key_cols)
        .orderBy("__tsn")
        .rangeBetween(-w_us, -1)
    )
    n = F.count(x).over(win)
    s1 = F.sum(x).over(win)
    s2 = F.sum(x * x).over(win)
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - F.lit(int(ddof)))
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    ok = (n >= F.lit(int(min_points))) & (std > 0)
    z = F.when(ok, (x - mean) / std)
    return (
        d.withColumn("mean_w", F.when(n > 0, mean))
        .withColumn("std_w", F.when(n > 0, std))
        .withColumn("zscore", z)
        .withColumn(
            "is_anomaly",
            F.when(z.isNotNull(), F.abs(z) > F.lit(float(threshold))),
        )
        .drop("__tsn")
    )
