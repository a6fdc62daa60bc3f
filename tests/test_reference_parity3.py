"""Reference-execution parity, wave 3 — randomized configs and the
long-tail API.

The headline here is the hypothesis fuzz: RANDOM (irregular index,
window, stride, window_idx, include_final_window) configurations are
executed through the actual reference (the strongest oracle there is —
its own window-count formula, grid anchoring, and NaN policy as
implemented) and through tsflex_spark, values compared exactly. Plus:
bound_method outer, index-aware input_type=pd.Series functions,
FeatureCollection.reduce round-trip, SeriesProcessor with multiple
series and dataframe_func, and degenerate window>span edges.
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


def test_rolling_grid_fuzz_vs_reference(spark):
    """Hypothesis fuzz with the REFERENCE as the oracle: random sparse
    second-offsets, window/stride choices, window_idx, and
    include_final_window — reference and engine must agree exactly on
    every drawn configuration (names, grid, values, NaN placement)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from tsflex.features import FeatureCollection, FeatureDescriptor

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        secs=st.sets(st.integers(0, 600), min_size=3, max_size=80),
        window=st.sampled_from([7, 20, 45, 120]),
        stride=st.sampled_from([3, 10, 35]),
        widx=st.sampled_from(["begin", "middle", "end"]),
        final=st.booleans(),
        data=st.data(),
    )
    def prop(secs, window, stride, widx, final, data):
        secs = sorted(secs)
        vals = data.draw(
            st.lists(
                st.floats(min_value=-50, max_value=50, allow_nan=False, width=16),
                min_size=len(secs),
                max_size=len(secs),
            )
        )
        ts = pd.Timestamp("2024-09-01") + pd.to_timedelta(secs, unit="s")
        s = pd.Series([float(x) for x in vals], index=ts, name="v")
        rfc = FeatureCollection(
            FeatureDescriptor(np.sum, "v", f"{window}s", f"{stride}s")
        )
        r = _ref_calc(
            rfc, [s], window_idx=widx, include_final_window=final,
            approve_sparsity=True,
        )
        pdf = pd.DataFrame({"ts": ts, "v": s.to_numpy()})
        sfc = SparkFC([SparkFD("sum", "v", f"{window}s", f"{stride}s")])
        g = _spark_calc(
            spark, sfc, pdf, window_idx=widx, include_final_window=final,
            approve_sparsity=True,
        )
        _compare(r, g)

    prop()


def test_sequence_and_count_fuzz_vs_reference(spark):
    """Second reference-as-oracle fuzz: SEQUENCE-domain rolling (numeric
    index) and COUNT-BASED windows (int window over a DatetimeIndex —
    the TimeIndexSampleStridedRolling dispatch) under random irregular
    grids."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from tsflex.features import FeatureCollection, FeatureDescriptor

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        idxs=st.sets(st.integers(0, 500), min_size=4, max_size=60),
        window=st.sampled_from([9, 30, 80]),
        stride=st.sampled_from([4, 15]),
        count_based=st.booleans(),
        final=st.booleans(),
        widx=st.sampled_from(["begin", "middle", "end"]),
        data=st.data(),
    )
    def prop(idxs, window, stride, count_based, final, widx, data):
        idxs = sorted(idxs)
        vals = data.draw(
            st.lists(
                st.floats(min_value=-20, max_value=20, allow_nan=False, width=16),
                min_size=len(idxs),
                max_size=len(idxs),
            )
        )
        if count_based:
            # int window over a time index → sample-position segmentation.
            # Two REFERENCE-SIDE crashes are pinned away here (engine
            # handles both edges; reproduced directly, see NOTES_DEV
            # "Direct reference-execution parity lane"):
            # - include_final_window=True raises IndexError when the
            #   final window starts past the last sample (index[n] read;
            #   4 samples / window 2 / stride 1 reproduces);
            # - window_idx="middle" raises IndexError("arrays used as
            #   indices must be of integer or boolean type") — the
            #   half-sample middle positions are floats in
            #   TimeIndexSampleStridedRolling (strided_rolling.py:686).
            index = pd.Timestamp("2024-09-02") + pd.to_timedelta(idxs, unit="s")
            w, st_ = max(2, window // 10), max(1, stride // 3)
            final = False
            if widx == "middle":
                widx = "begin"
        else:
            index = np.asarray(idxs, dtype="int64")
            w, st_ = window, stride
        s = pd.Series([float(x) for x in vals], index=index, name="v")
        rfc = FeatureCollection(FeatureDescriptor(np.sum, "v", w, st_))
        r = _ref_calc(
            rfc, [s], include_final_window=final, window_idx=widx,
            approve_sparsity=True,
        )
        pdf = pd.DataFrame({"ts": index, "v": s.to_numpy()})
        sfc = SparkFC([SparkFD("sum", "v", w, st_)])
        g = _spark_calc(
            spark, sfc, pdf, include_final_window=final, window_idx=widx,
            approve_sparsity=True,
        )
        _compare(r, g)

    prop()


def test_bound_method_outer_parity(spark):
    """bound_method='outer' with two different-span series: the grid
    anchors at the UNION bounds (reference _determine_bounds)."""
    from tsflex.features import FeatureCollection, FeatureDescriptor

    rng = np.random.default_rng(43)
    ts_a = pd.date_range("2024-05-02 00:00:00", periods=200, freq="3s")
    ts_b = pd.date_range("2024-05-02 00:03:00", periods=150, freq="3s")
    a = pd.Series(rng.normal(size=200).round(4), index=ts_a, name="a")
    b = pd.Series(rng.normal(size=150).round(4), index=ts_b, name="b")
    rfc = FeatureCollection(
        [
            FeatureDescriptor(np.sum, "a", "45s", "45s"),
            FeatureDescriptor(np.sum, "b", "45s", "45s"),
        ]
    )
    r = _ref_calc(rfc, [a, b], bound_method="outer", approve_sparsity=True)
    pdf = (
        pd.DataFrame({"ts": ts_a, "a": a.to_numpy()})
        .merge(pd.DataFrame({"ts": ts_b, "b": b.to_numpy()}), on="ts", how="outer")
        .sort_values("ts")
    )
    sfc = SparkFC(
        [
            SparkFD("sum", "a", "45s", "45s"),
            SparkFD("sum", "b", "45s", "45s"),
        ]
    )
    g = _spark_calc(spark, sfc, pdf, bound_method="outer", approve_sparsity=True)
    _compare(r, g)


def test_index_aware_input_type_parity(spark):
    """input_type=pd.Series functions see the segment WITH its index —
    a time-weighted statistic must agree between engines."""
    from tsflex.features import FeatureCollection, FeatureDescriptor, FuncWrapper

    def span_seconds(x: pd.Series) -> float:
        if len(x) < 2:
            return 0.0
        return float((x.index[-1] - x.index[0]).total_seconds())

    s = _time_series(n=240, seed=47, gaps=True)
    rfc = FeatureCollection(
        FeatureDescriptor(
            FuncWrapper(span_seconds, output_names="span_s", input_type=pd.Series),
            "v", "40s", "20s",
        )
    )
    r = _ref_calc(rfc, [s], approve_sparsity=True)
    pdf = pd.DataFrame({"ts": s.index, "v": s.to_numpy()})
    sfc = SparkFC(
        [
            SparkFD(
                SparkFW(span_seconds, output_names="span_s", input_type=pd.Series),
                "v", "40s", "20s",
            )
        ]
    )
    g = _spark_calc(spark, sfc, pdf, approve_sparsity=True)
    _compare(r, g)


def test_reduce_parity(spark):
    """reduce(feat_cols_to_keep) must keep the same computation for the
    kept columns in both engines."""
    from tsflex.features import FeatureCollection, FeatureDescriptor

    s = _time_series(n=200, seed=53)
    keep = ["v__sum__w=30s"]
    rfc = FeatureCollection(
        [
            FeatureDescriptor(np.sum, "v", "30s", "15s"),
            FeatureDescriptor(np.mean, "v", "30s", "15s"),
        ]
    ).reduce(keep)
    r = _ref_calc(rfc, [s], approve_sparsity=True)
    assert set(r.columns) == {"ts", "v__sum__w=30s"}

    pdf = pd.DataFrame({"ts": s.index, "v": s.to_numpy()})
    sfc = SparkFC(
        [
            SparkFD("sum", "v", "30s", "15s"),
            SparkFD("mean", "v", "30s", "15s"),
        ]
    ).reduce(keep)
    g = _spark_calc(spark, sfc, pdf, approve_sparsity=True)
    _compare(r, g)


def test_series_processor_multi_series_and_dataframe_func_parity(spark):
    """SeriesProcessor over multiple series names + a dataframe_func
    processor, chained in one pipeline — processing subsystem long tail."""
    from tsflex.processing import SeriesPipeline, SeriesProcessor
    from tsflex.processing import dataframe_func as ref_df_func

    from tsflex_spark.processing import (
        SeriesPipeline as SparkPipeline,
        SeriesProcessor as SparkProcessor,
        dataframe_func as spark_df_func,
    )

    rng = np.random.default_rng(59)
    n = 220
    ts = pd.date_range("2024-10-01", periods=n, freq="2s")
    a = pd.Series(rng.normal(size=n).round(4), index=ts, name="a")
    b = pd.Series(rng.normal(size=n).round(4), index=ts, name="b")

    def square(x: pd.Series) -> pd.Series:
        return x**2

    @ref_df_func
    def add_total_ref(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["total"] = df["a"] + df["b"]
        return df

    rpipe = SeriesPipeline(
        [
            SeriesProcessor(square, ["a", "b"]),
            SeriesProcessor(add_total_ref, ("a", "b")),
        ]
    )
    rdf = rpipe.process([a, b], return_df=True)
    rdf = rdf.reset_index().rename(columns={"index": "ts"})

    @spark_df_func
    def add_total_spark(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["total"] = df["a"] + df["b"]
        return df

    pdf = pd.DataFrame({"ts": ts, "a": a.to_numpy(), "b": b.to_numpy()})
    spipe = SparkPipeline(
        [
            SparkProcessor(square, ["a", "b"]),
            SparkProcessor(add_total_spark, ("a", "b")),
        ]
    )
    g = spipe.process(spark.createDataFrame(pdf), ts_col="ts").toPandas()
    merged = rdf.merge(g, on="ts", suffixes=("_ref", "_spark"))
    assert len(merged) == n
    for c in ("a", "b", "total"):
        assert np.allclose(merged[f"{c}_ref"], merged[f"{c}_spark"], rtol=1e-12), c


def test_unsorted_duplicate_segment_idxs_parity(spark):
    """The reference preserves USER ORDER of explicit segment idxs,
    including duplicates (its tests pin res.index == the given list);
    a distributed engine returns sorted output instead, so parity here
    is the row MULTISET: same segments, same values, duplicates kept."""
    from tsflex.features import FeatureCollection, FeatureDescriptor

    s = pd.Series(np.arange(20, dtype="float64"), name="dummy")
    starts, ends = [0, 5, 3, 3], [5, 10, 8, 5]
    rfc = FeatureCollection(
        [
            FeatureDescriptor(np.min, "dummy", 100),
            FeatureDescriptor(len, "dummy"),
        ]
    )
    r = rfc.calculate(
        s, segment_start_idxs=starts, segment_end_idxs=ends,
        return_df=True, window_idx="begin", n_jobs=1,
    )
    r = r.reset_index().rename(columns={"index": "ts"})

    pdf = pd.DataFrame({"ts": range(20), "dummy": np.arange(20, dtype="float64")})
    sfc = SparkFC(
        [SparkFD("min", "dummy", 100), SparkFD("count", "dummy")]
    )
    g = (
        sfc.calculate(
            spark.createDataFrame(pdf), ts_col="ts",
            segment_start_idxs=starts, segment_end_idxs=ends,
            window_idx="begin",
        )
        .toPandas()
        .rename(columns={"dummy__count__w=manual": "dummy__len__w=manual"})
    )
    key = ["ts", "dummy__len__w=manual"]
    r = r.sort_values(key).reset_index(drop=True)
    g = g.sort_values(key).reset_index(drop=True)
    assert len(r) == len(g) == 4
    for c in ("ts", "dummy__min__w=manual", "dummy__len__w=manual"):
        assert np.allclose(
            r[c].to_numpy(dtype=float), g[c].to_numpy(dtype=float)
        ), c


def test_window_longer_than_span_parity(spark):
    """Degenerate edges: window longer than the data span, and a
    single-sample series — the reference's window-count formula decides
    whether ANY row comes out; both engines must agree."""
    from tsflex.features import FeatureCollection, FeatureDescriptor

    for n in (1, 3):
        ts = pd.date_range("2024-11-01", periods=n, freq="5s")
        s = pd.Series(np.arange(n, dtype="float64"), index=ts, name="v")
        for final in (False, True):
            rfc = FeatureCollection(FeatureDescriptor(np.sum, "v", "10min", "1min"))
            r = _ref_calc(
                rfc, [s], include_final_window=final, approve_sparsity=True
            )
            pdf = pd.DataFrame({"ts": ts, "v": s.to_numpy()})
            sfc = SparkFC([SparkFD("sum", "v", "10min", "1min")])
            g = _spark_calc(
                spark, sfc, pdf, include_final_window=final, approve_sparsity=True
            )
            _compare(r, g)
