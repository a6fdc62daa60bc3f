"""Reference-execution parity, wave 2 — the rest of the API surface.

Same method as tests/test_reference_parity.py: execute identical
configurations through the actual reference checkout (pandas, n_jobs=1,
shimmed via tests/_reference_shim.py) and through tsflex_spark, compare
values exactly. Covers: group_by_all, two-series functions with
inner-bound alignment, bound_method outer, explicit manual segments,
vectorized FuncWrapper, multi-window outer-merge assembly, count-based
windows on a time index (TimeIndexSampleStridedRolling parity), and
gap-aware chunking.
"""

import numpy as np
import pandas as pd
import pytest

from tests._reference_shim import install_reference

ref = install_reference()
pytestmark = pytest.mark.skipif(
    ref is None, reason="reference tsflex checkout not importable"
)

from tsflex_spark import (  # noqa: E402
    FeatureCollection as SparkFC,
    FeatureDescriptor as SparkFD,
    FuncWrapper as SparkFW,
)
from tests.test_reference_parity import (  # noqa: E402
    _compare,
    _ref_calc,
    _spark_calc,
    _time_series,
)


def test_group_by_all_parity(spark):
    """group_by_all (single column — the reference's supported form):
    SQL-style per-key features, NaN keys dropped with a warning."""
    import warnings

    from tsflex.features import FeatureCollection, FeatureDescriptor

    rng = np.random.default_rng(13)
    n = 200
    ts = pd.date_range("2024-04-01", periods=n, freq="30s")
    df = pd.DataFrame(
        {
            "g": rng.choice(["u1", "u2", "u3", None], size=n),
            "v": rng.normal(size=n).round(3),
        },
        index=ts,
    )
    rfc = FeatureCollection(FeatureDescriptor(np.sum, "v", "1h", "1h"))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = rfc.calculate(df, return_df=True, n_jobs=1, group_by_all="g")
    # reference indexes the result BY the group column
    r = r.reset_index().sort_values("g").reset_index(drop=True)

    pdf = pd.DataFrame({"ts": ts, "g": df["g"].to_numpy(), "v": df["v"].to_numpy()})
    sfc = SparkFC([SparkFD("sum", "v", "1h", "1h")])
    out = (
        sfc.calculate(spark.createDataFrame(pdf), ts_col="ts", group_by_all="g")
        .toPandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    shared = [c for c in r.columns if c in out.columns]
    assert "v__sum__w=manual" in shared and "g" in shared
    _compare(r[shared], out[shared])


def test_two_series_inner_bound_parity(spark):
    """A two-input function over (a, b) with DIFFERENT series spans:
    inner bound slicing must align both engines (reference segmenter
    inner-bound semantics)."""
    from tsflex.features import FeatureCollection, FeatureDescriptor, FuncWrapper

    rng = np.random.default_rng(17)
    ts_a = pd.date_range("2024-05-01 00:00:00", periods=300, freq="2s")
    ts_b = pd.date_range("2024-05-01 00:02:00", periods=260, freq="2s")
    a = pd.Series(rng.normal(size=300).round(4), index=ts_a, name="a")
    b = pd.Series(rng.normal(size=260).round(4), index=ts_b, name="b")

    def absdiff_mean(x, y):
        m = min(len(x), len(y))
        if m == 0:
            return np.nan
        return float(np.abs(x[:m] - y[:m]).mean())

    rfc = FeatureCollection(
        FeatureDescriptor(
            FuncWrapper(absdiff_mean, output_names="admean"),
            ("a", "b"), "60s", "30s",
        )
    )
    r = _ref_calc(rfc, [a, b], approve_sparsity=True)

    pdf_a = pd.DataFrame({"ts": ts_a, "a": a.to_numpy()})
    pdf_b = pd.DataFrame({"ts": ts_b, "b": b.to_numpy()})
    pdf = pdf_a.merge(pdf_b, on="ts", how="outer").sort_values("ts")
    sfc = SparkFC(
        [
            SparkFD(
                SparkFW(absdiff_mean, output_names="admean"),
                ("a", "b"), "60s", "30s",
            )
        ]
    )
    g = _spark_calc(spark, sfc, pdf, approve_sparsity=True)
    _compare(r, g)


def test_manual_segments_parity(spark):
    """Explicit segment_start_idxs + segment_end_idxs (variable-length
    windows, window=None) — reference strided_rolling manual path."""
    from tsflex.features import FeatureCollection, FeatureDescriptor

    s = _time_series(n=300, seed=23)
    starts = pd.DatetimeIndex(
        ["2024-02-01 00:00:10", "2024-02-01 00:01:00", "2024-02-01 00:03:20"]
    )
    ends = pd.DatetimeIndex(
        ["2024-02-01 00:00:50", "2024-02-01 00:02:30", "2024-02-01 00:04:59"]
    )
    rfc = FeatureCollection(FeatureDescriptor(np.sum, "v"))
    r = _ref_calc(
        rfc,
        [s],
        segment_start_idxs=starts,
        segment_end_idxs=ends,
        window_idx="begin",
        approve_sparsity=True,
    )
    pdf = pd.DataFrame({"ts": s.index, "v": s.to_numpy()})
    sfc = SparkFC([SparkFD("sum", "v")])
    g = _spark_calc(
        spark,
        sfc,
        pdf,
        segment_start_idxs=list(starts),
        segment_end_idxs=list(ends),
        window_idx="begin",
        approve_sparsity=True,
    )
    _compare(r, g)


def test_vectorized_funcwrapper_parity(spark):
    """vectorized=True functions receive the (nb, window) batch in the
    reference; the Spark vectorized path must produce identical values
    on equal-length segments."""
    from tsflex.features import FeatureCollection, FeatureDescriptor, FuncWrapper

    rng = np.random.default_rng(29)
    n = 256
    ts = pd.date_range("2024-06-01", periods=n, freq="1s")
    s = pd.Series(rng.normal(size=n).round(4), index=ts, name="v")
    rfc = FeatureCollection(
        FeatureDescriptor(
            FuncWrapper(np.max, output_names="vmax", vectorized=True, axis=-1),
            "v", "32s", "32s",
        )
    )
    r = _ref_calc(rfc, [s], approve_sparsity=True)
    pdf = pd.DataFrame({"ts": ts, "v": s.to_numpy()})
    sfc = SparkFC(
        [
            SparkFD(
                SparkFW(np.max, output_names="vmax", vectorized=True, axis=-1),
                "v", "32s", "32s",
            )
        ]
    )
    g = _spark_calc(spark, sfc, pdf, approve_sparsity=True)
    _compare(r, g)


def test_multi_window_outer_merge_parity(spark):
    """Two windows + two strides on one series: the reference outer-
    merges per-config frames on the output index; column set, index
    union, and NaN placement must match."""
    from tsflex.features import FeatureCollection, FeatureDescriptor

    s = _time_series(n=350, seed=31)
    rfc = FeatureCollection(
        [
            FeatureDescriptor(np.sum, "v", "30s", "10s"),
            FeatureDescriptor(np.mean, "v", "60s", "25s"),
        ]
    )
    r = _ref_calc(rfc, [s], approve_sparsity=True)
    pdf = pd.DataFrame({"ts": s.index, "v": s.to_numpy()})
    sfc = SparkFC(
        [
            SparkFD("sum", "v", "30s", "10s"),
            SparkFD("mean", "v", "60s", "25s"),
        ]
    )
    g = _spark_calc(spark, sfc, pdf, approve_sparsity=True)
    _compare(r, g)


def test_count_based_window_parity(spark):
    """Integer window over a DatetimeIndex — the reference dispatches to
    TimeIndexSampleStridedRolling (sample-position segmentation, time
    output index). Exercised on an IRREGULAR index where time- and
    count-based windows genuinely differ."""
    from tsflex.features import FeatureCollection, FeatureDescriptor

    rng = np.random.default_rng(37)
    secs = np.sort(rng.choice(2000, size=180, replace=False))
    ts = pd.Timestamp("2024-07-01") + pd.to_timedelta(secs, unit="s")
    s = pd.Series(rng.normal(size=180).round(4), index=ts, name="v")
    rfc = FeatureCollection(FeatureDescriptor(np.sum, "v", 25, 10))
    r = _ref_calc(rfc, [s], approve_sparsity=True)
    pdf = pd.DataFrame({"ts": ts, "v": s.to_numpy()})
    sfc = SparkFC([SparkFD("sum", "v", 25, 10)])
    g = _spark_calc(spark, sfc, pdf, approve_sparsity=True)
    _compare(r, g)


def test_chunk_data_parity(spark):
    """Gap-aware chunking vs the reference chunk_data: chunk boundaries
    on gapped single-series data must agree (reference chunking.py:213)."""
    from tsflex.chunking import chunk_data as ref_chunk

    from tsflex_spark.chunking import chunk_data as spark_chunk

    rng = np.random.default_rng(41)
    # 1 Hz data with two big gaps
    secs = np.concatenate([np.arange(0, 300), np.arange(900, 1100), np.arange(5000, 5050)])
    ts = pd.Timestamp("2024-08-01") + pd.to_timedelta(secs, unit="s")
    s = pd.Series(rng.normal(size=len(secs)), index=ts, name="v")

    ref_chunks = ref_chunk([s], fs_dict={"v": 1}, min_chunk_dur="10s")
    ref_bounds = sorted(
        (c[0].index[0], c[0].index[-1]) for c in ref_chunks
    )

    pdf = pd.DataFrame({"ts": ts, "v": s.to_numpy()})
    out = spark_chunk(
        spark.createDataFrame(pdf), ts_col="ts", value_col="v", fs=1,
        min_chunk_dur="10s",
    ).toPandas()
    got_bounds = sorted(
        (row.chunk_start, row.chunk_end) for row in out.itertuples()
    )
    assert len(got_bounds) == len(ref_bounds), (got_bounds, ref_bounds)
    for (gs, ge), (rs, re_) in zip(got_bounds, ref_bounds):
        assert pd.Timestamp(gs) == rs and pd.Timestamp(ge) == re_, (
            (gs, ge), (rs, re_),
        )
