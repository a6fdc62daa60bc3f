"""Time-series downsampling for visualization and storage: M4 and
MinMaxLTTB, distributed.

Public reference semantics: M4 (Jugel et al., VLDB 2014) keeps the
min/max/first/last of each of ``n_out`` equal-width time bins — the
lossless-for-line-rendering aggregation, and a pure groupBy here.
LTTB (Steinarsson 2013) picks one point per bin maximizing the triangle
area with the previously selected point and the next bin's average;
it is inherently sequential. MinMaxLTTB (predict-idlab,
arXiv:2305.00332) makes it scalable: PRESELECT ``ratio`` min/max pairs
per output bin (embarrassingly parallel), then run plain LTTB over the
preselected ≈ ``2·ratio·n_out`` points — output is near-identical to
exact LTTB at a fraction of the scan cost.

Spark decomposition:

- ``m4``: one map-side-combined groupBy per (key, bin) — four
  aggregates; the join back to recover the y-values at argmin/argmax
  timestamps is done with min_by/max_by in the SAME aggregate (no
  second scan, no join).
- ``minmax_preselect``: same shape with ``2·ratio`` extrema per bin.
- ``lttb``: per key, the bounded preselected set (2·ratio·n_out rows —
  thousands, not billions) flows through ONE ``applyInPandas`` group
  running the exact sequential LTTB; the corpus-sized scan never
  leaves the JVM. Unkeyed input is one group — same contract as the
  pandas-tier SeriesProcessor (a whole-series sequential algorithm
  needs its series in one place; the preselect bounds what that place
  must hold).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsflex_spark.utils.time_args import ts_micros


def _bin_col(df: DataFrame, ts_col: str, n_bins: int, key_cols: Sequence[str]):
    """Equal-width bin index over [min, max] per key (matching the
    canonical M4/LTTB formulation); bounds ride a per-key broadcast."""
    d = df.withColumn("__tsn", ts_micros(ts_col))
    if key_cols:
        bounds = d.groupBy(*key_cols).agg(
            F.min("__tsn").alias("__lo"), F.max("__tsn").alias("__hi")
        )
        d = d.join(F.broadcast(bounds), on=list(key_cols))
    else:
        bounds = d.agg(
            F.min("__tsn").alias("__lo"), F.max("__tsn").alias("__hi")
        )
        d = d.join(F.broadcast(bounds))
    span = (F.col("__hi") - F.col("__lo")).cast("double")
    pos = (F.col("__tsn") - F.col("__lo")).cast("double")
    b = F.when(span == 0, F.lit(0)).otherwise(
        F.least(
            F.floor(pos / span * F.lit(float(n_bins))).cast("int"),
            F.lit(int(n_bins) - 1),
        )
    )
    return d.withColumn("__bin", b)


def m4(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    n_out: int,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """M4 downsampling: per (key, bin) the first/last/min/max points.

    Returns one row per (key, bin) with 8 columns of (ts, value) for
    the four anchors — ``min_by``/``max_by`` recover each anchor's
    partner coordinate inside the single aggregate, so the whole
    operator is one shuffle of 8 scalars per bin.
    """
    key_cols = list(key_cols)
    d = _bin_col(df, ts_col, n_out, key_cols)
    agg = d.groupBy(*key_cols, "__bin").agg(
        F.min_by(ts_col, "__tsn").alias("first_ts"),
        F.min_by(value_col, "__tsn").alias("first_val"),
        F.max_by(ts_col, "__tsn").alias("last_ts"),
        F.max_by(value_col, "__tsn").alias("last_val"),
        F.min_by(ts_col, value_col).alias("min_ts"),
        F.min(value_col).alias("min_val"),
        F.max_by(ts_col, value_col).alias("max_ts"),
        F.max(value_col).alias("max_val"),
    )
    return agg.withColumnRenamed("__bin", "bin").orderBy(*key_cols, "bin")


def minmax_preselect(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    n_out: int,
    ratio: int = 4,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """MinMaxLTTB's parallel phase: per key, the min and max point of
    each of ``ratio·n_out`` fine bins — ≈ ``2·ratio·n_out`` rows per
    key survive, whatever the input size. Pure codegen aggregate."""
    key_cols = list(key_cols)
    d = _bin_col(df, ts_col, n_out * ratio, key_cols)
    agg = d.groupBy(*key_cols, "__bin").agg(
        F.min_by("__tsn", value_col).alias("__t_min"),
        F.min(value_col).alias("__v_min"),
        F.max_by("__tsn", value_col).alias("__t_max"),
        F.max(value_col).alias("__v_max"),
    )
    mins = agg.select(
        *key_cols, F.col("__t_min").alias("__tsn"), F.col("__v_min").alias("__v")
    )
    maxs = agg.select(
        *key_cols, F.col("__t_max").alias("__tsn"), F.col("__v_max").alias("__v")
    )
    # a bin's min and max can be the same row (monotone bin) — dedup
    return mins.unionByName(maxs).dropDuplicates(key_cols + ["__tsn", "__v"])


def _lttb_numpy(t: np.ndarray, v: np.ndarray, n_out: int) -> np.ndarray:
    """Exact sequential LTTB over sorted arrays; returns kept indices."""
    n = len(t)
    if n_out >= n or n_out <= 2:
        return np.arange(n) if n_out >= n else np.array([0, n - 1])
    kept = [0]
    # bucket boundaries over the interior points (canonical formulation)
    bounds = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    a = 0
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo, nhi = bounds[i + 1], (bounds[i + 2] if i + 2 < len(bounds) else n)
        if nhi > nlo:
            avg_t = t[nlo:nhi].mean()
            avg_v = v[nlo:nhi].mean()
        else:
            avg_t, avg_v = t[n - 1], v[n - 1]
        seg_t, seg_v = t[lo:hi], v[lo:hi]
        if len(seg_t) == 0:
            continue
        area = np.abs(
            (t[a] - avg_t) * (seg_v - v[a]) - (t[a] - seg_t) * (avg_v - v[a])
        )
        a = lo + int(area.argmax())
        kept.append(a)
    kept.append(n - 1)
    return np.asarray(kept)


def lttb(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    n_out: int,
    key_cols: Sequence[str] = (),
    ratio: int = 0,
) -> DataFrame:
    """LTTB downsampling to ``n_out`` points per key.

    ``ratio > 0`` enables the MinMaxLTTB scale path: the corpus-sized
    scan reduces to ``2·ratio·n_out`` extrema per key JVM-side first,
    and only that bounded set enters the Arrow group running exact
    LTTB. ``ratio=0`` runs exact LTTB over the full series (small
    data / parity testing). Output keeps the original ts/value columns.
    """
    key_cols = list(key_cols)
    if ratio > 0:
        pre = minmax_preselect(df, ts_col, value_col, n_out, ratio, key_cols)
        src = pre.select(*key_cols, F.col("__tsn"), F.col("__v"))
    else:
        d = df.withColumn("__tsn", ts_micros(ts_col))
        src = d.select(
            *key_cols, "__tsn", F.col(value_col).cast("double").alias("__v")
        )
    out_schema = ", ".join(
        [f"`{c}` {src.schema[c].dataType.simpleString()}" for c in key_cols]
        + ["__tsn long", "__v double"]
    )

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__tsn").reset_index(drop=True)
        idx = _lttb_numpy(
            pdf["__tsn"].to_numpy(dtype="float64"),
            pdf["__v"].to_numpy(dtype="float64"),
            n_out,
        )
        return pdf.iloc[idx][list(pdf.columns)]

    if key_cols:
        sel = src.groupBy(*key_cols).applyInPandas(_run, schema=out_schema)
    else:
        sel = src.groupBy(F.lit(0).alias("__g")).applyInPandas(
            _run, schema=out_schema
        )
    # join back on (key, tsn) to restore original typed columns
    d0 = df.withColumn("__tsn", ts_micros(ts_col))
    keep = sel.select(*key_cols, "__tsn")
    out = d0.join(keep, on=key_cols + ["__tsn"], how="left_semi")
    return out.drop("__tsn").orderBy(*key_cols, ts_col)
