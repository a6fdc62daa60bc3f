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

from typing import Optional, Sequence

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
    # materialize the THREE window aggregates once, then derive — chained
    # withColumn would re-inline the window expressions into every
    # derived column (measured: the final Window node carried 26
    # duplicated frame aggregates instead of 3)
    d = d.select(
        "*",
        F.count(x).over(win).alias("__n"),
        F.sum(x).over(win).alias("__s1"),
        F.sum(x * x).over(win).alias("__s2"),
    )
    n, s1, s2 = F.col("__n"), F.col("__s1"), F.col("__s2")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - F.lit(int(ddof)))
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    d = d.select(
        "*",
        F.when(n > 0, mean).alias("mean_w"),
        F.when(n > 0, std).alias("std_w"),
        F.when(
            (n >= F.lit(int(min_points))) & (std > 0), (x - mean) / std
        ).alias("zscore"),
    )
    z = F.col("zscore")
    return d.withColumn(
        "is_anomaly",
        F.when(z.isNotNull(), F.abs(z) > F.lit(float(threshold))),
    ).drop("__tsn", "__n", "__s1", "__s2")


def seasonal_profile(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Sequence[str] = (),
    period: str = "hour_of_week",
) -> DataFrame:
    """Per (key, season-slot) mean/std/count baseline — the seasonal
    naive profile (traffic by hour-of-week, sensor by hour-of-day).
    One map-side-combined groupBy; the profile is slot-count-sized.

    ``period``: ``hour_of_week`` (168 slots), ``hour_of_day`` (24),
    ``day_of_week`` (7), ``minute_of_hour`` (60).
    """
    slot = _season_slot(ts_col, period)
    x = F.col(value_col).cast("double")
    return (
        df.withColumn("__slot", slot)
        .groupBy(*list(key_cols), "__slot")
        .agg(
            F.count(x).alias("n"),
            F.avg(x).alias("mean"),
            F.stddev_pop(x).alias("std"),
        )
        .withColumnRenamed("__slot", "slot")
    )


def _season_slot(ts_col: str, period: str):
    t = F.col(ts_col).cast("timestamp")
    if period == "hour_of_week":
        # dayofweek: 1=Sunday … 7=Saturday (Spark); stable slot id
        return ((F.dayofweek(t) - 1) * 24 + F.hour(t)).cast("int")
    if period == "hour_of_day":
        return F.hour(t).cast("int")
    if period == "day_of_week":
        return (F.dayofweek(t) - 1).cast("int")
    if period == "minute_of_hour":
        return F.minute(t).cast("int")
    raise ValueError(f"unknown period {period!r}")


def anomaly_seasonal(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Sequence[str] = (),
    period: str = "hour_of_week",
    min_points: int = 5,
    threshold: float = 3.0,
    profile: Optional[DataFrame] = None,
) -> DataFrame:
    """Flag deviations from the SEASONAL baseline: z-score against the
    (key, season-slot) profile instead of a trailing window — catches
    "normal for 3am, anomalous for 3pm" patterns a trailing z-score
    normalizes away.

    The profile joins back broadcast (slots × keys rows). Pass a
    pre-computed ``profile`` (e.g. last month's, via
    ``seasonal_profile``) to score against a FROZEN baseline — the
    production shape, which also makes this a narrow per-row plan that
    runs on streams.
    """
    key_cols = list(key_cols)
    prof = (
        profile
        if profile is not None
        else seasonal_profile(df, ts_col, value_col, key_cols, period)
    )
    d = df.withColumn("slot", _season_slot(ts_col, period))
    joined = d.join(F.broadcast(prof), on=key_cols + ["slot"], how="left")
    x = F.col(value_col).cast("double")
    ok = (
        F.col("n").isNotNull()
        & (F.col("n") >= F.lit(int(min_points)))
        & (F.col("std") > 0)
    )
    z = F.when(ok, (x - F.col("mean")) / F.col("std"))
    return (
        joined.withColumn("zscore", z)
        .withColumn(
            "is_anomaly",
            F.when(z.isNotNull(), F.abs(z) > F.lit(float(threshold))),
        )
        .drop("n")
    )


def cusum(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Sequence[str],
    *,
    target: Optional[float] = None,
    sigma: Optional[float] = None,
    k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """Two-sided CUSUM change detection per key (Page 1954 — the
    standard mean-shift monitor): ``S⁺_t = max(0, S⁺_{t-1} + z_t - k)``
    and the symmetric ``S⁻``; alarm when either exceeds ``h`` (both in
    σ units, the classical k=0.5/h=5 defaults ≈ detect 1σ shifts).

    Distributed form: the recursive max is NOT associative, but
    ``S⁺_t = P_t - min_{i≤t} P_i`` where ``P`` is the prefix sum of
    ``z - k`` — prefix sum and running min are both frame aggregates,
    so the whole operator is ONE keyed window exchange, all codegen.

    ``target``/``sigma`` freeze the in-control mean/σ (the production
    shape — estimated on reference data, monitored on new data); left
    None they are estimated per key from ``df`` itself in one extra
    aggregate (broadcast back).
    """
    key_cols = list(key_cols)
    if not key_cols:
        raise ValueError(
            "cusum requires key_cols (unkeyed = single-partition window); "
            "segment or key the series first"
        )
    d = df.withColumn("__tsn", ts_micros(ts_col))
    x = F.col(value_col).cast("double")
    if target is None or sigma is None:
        base = d.groupBy(*key_cols).agg(
            F.avg(x).alias("__mu"), F.stddev_pop(x).alias("__sd")
        )
        d = d.join(F.broadcast(base), on=key_cols)
        mu = F.col("__mu") if target is None else F.lit(float(target))
        sd = F.col("__sd") if sigma is None else F.lit(float(sigma))
    else:
        mu, sd = F.lit(float(target)), F.lit(float(sigma))
    z = (x - mu) / sd
    cum = (
        Window.partitionBy(*key_cols)
        .orderBy("__tsn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.select(
        "*",
        F.sum(z - F.lit(float(k))).over(cum).alias("__pp"),
        F.sum(z + F.lit(float(k))).over(cum).alias("__pn"),
    )
    d = d.select(
        "*",
        F.min("__pp").over(cum).alias("__ppmin"),
        F.max("__pn").over(cum).alias("__pnmax"),
    )
    # S+ = P_t - min(0, min_{i<=t} P_i): the EMPTY prefix (value 0)
    # participates in the min — without it a monotone-up P would have
    # S+ stuck at P_t - P_1 instead of P_t. Symmetric for S-.
    s_pos = F.col("__pp") - F.least(F.lit(0.0), F.col("__ppmin"))
    s_neg = F.greatest(F.lit(0.0), F.col("__pnmax")) - F.col("__pn")
    out = d.select(
        *[c for c in df.columns],
        s_pos.alias("cusum_pos"),
        s_neg.alias("cusum_neg"),
        ((s_pos > F.lit(float(h))) | (s_neg > F.lit(float(h)))).alias("is_shifted"),
    )
    return out
