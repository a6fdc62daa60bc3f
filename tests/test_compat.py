"""from_tsflex migration shim: convert REAL tsflex objects and verify the
converted Spark plan reproduces the reference's own output exactly.

This is the switch-engines contract: a user's existing tsflex
FeatureCollection / SeriesPipeline module should work on Spark after one
``from_tsflex`` call. Reference objects are built through tsflex 0.4.1
itself (shimmed via tests/_reference_shim.py) — conversion is duck-typed
(tsflex_spark.compat) so these tests also pin the attribute surface the
shim relies on (feature_collection.py:91, feature.py:133-157,
function_wrapper.py:99-118, series_processor.py:129-132).
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
    SeriesPipeline as SparkPipe,
    SeriesProcessor as SparkProc,
    from_tsflex,
)


def _series(n=300, seed=11, name="v", freq="2s"):
    rng = np.random.default_rng(seed)
    ts = pd.date_range("2024-03-01", periods=n, freq=freq)
    return pd.Series(rng.normal(size=n).round(4), index=ts, name=name)


def _compare(ref_df, spark_df):
    assert set(ref_df.columns) == set(spark_df.columns), (
        sorted(ref_df.columns),
        sorted(spark_df.columns),
    )
    assert len(ref_df) == len(spark_df), (len(ref_df), len(spark_df))
    for c in ref_df.columns:
        a, b = ref_df[c], spark_df[c]
        if c == "ts":
            assert list(pd.to_datetime(a)) == list(pd.to_datetime(b)), c
        elif a.dtype.kind in "fc" or b.dtype.kind in "fc":
            assert np.allclose(
                a.to_numpy(dtype=float),
                b.to_numpy(dtype=float),
                equal_nan=True,
                rtol=1e-12,
                atol=1e-12,
            ), (c, a.head().tolist(), b.head().tolist())
        else:
            assert list(a) == list(b), c


def _run_both(spark, ref_fc, s_or_list, pdf, **calc_kw):
    conv = from_tsflex(ref_fc)
    r = ref_fc.calculate(s_or_list, return_df=True, n_jobs=1, **calc_kw)
    r = r.reset_index().rename(columns={"index": "ts"})
    r = r.sort_values("ts").reset_index(drop=True)
    g = (
        conv.calculate(spark.createDataFrame(pdf), ts_col="ts", **calc_kw)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    _compare(r, g)
    return conv


def test_convert_feature_collection_native_and_udf(spark):
    """A mixed FC — numpy natives (identity-mapped to Catalyst aggregates),
    a custom callable (UDF tier), a FuncWrapper with kwargs and multi-output,
    multi-stride, and MultipleFeatureDescriptors expansion."""
    from tsflex.features import (
        FeatureCollection,
        FeatureDescriptor,
        FuncWrapper,
        MultipleFeatureDescriptors,
    )

    def span(x):
        return np.max(x) - np.min(x)

    fc = FeatureCollection(
        [
            MultipleFeatureDescriptors(
                functions=[np.mean, np.min, np.std],
                series_names="v",
                windows=["30s", "60s"],
                strides="30s",
            ),
            FeatureDescriptor(span, "v", "60s", ["30s", "45s"]),
            FeatureDescriptor(
                FuncWrapper(
                    np.quantile, output_names="q75", q=0.75, method="linear"
                ),
                "v",
                "30s",
                "30s",
            ),
            FeatureDescriptor(
                FuncWrapper(
                    lambda x: (np.min(x), np.max(x)),
                    output_names=["lo", "hi"],
                ),
                "v",
                "60s",
                "60s",
            ),
        ]
    )
    s = _series()
    pdf = pd.DataFrame({"ts": s.index, "v": s.to_numpy()})
    _run_both(spark, fc, s, pdf)


def test_convert_two_series_and_vectorized(spark):
    """Tuple series names and a vectorized FuncWrapper survive conversion."""
    from tsflex.features import FeatureCollection, FeatureDescriptor, FuncWrapper

    def xminusy_mean(x, y):
        return np.mean(x - y)

    def vec_rms(x):
        return np.sqrt(np.mean(np.square(x), axis=-1))

    fc = FeatureCollection(
        [
            FeatureDescriptor(xminusy_mean, ("a", "b"), "40s", "40s"),
            FeatureDescriptor(
                FuncWrapper(vec_rms, output_names="rms", vectorized=True),
                "a",
                "40s",
                "20s",
            ),
        ]
    )
    sa = _series(seed=1, name="a")
    sb = _series(seed=2, name="b")
    pdf = pd.DataFrame({"ts": sa.index, "a": sa.to_numpy(), "b": sb.to_numpy()})
    _run_both(spark, fc, [sa, sb], pdf)


def test_convert_make_robust_and_sequence_window(spark):
    """Reference make_robust output converts (it is a FuncWrapper holding a
    closure); integer sequence-domain windows pass through."""
    from tsflex.features import FeatureCollection, FeatureDescriptor
    from tsflex.features.utils import make_robust

    fc = FeatureCollection(
        [FeatureDescriptor(make_robust(np.mean, min_nb_samples=5), "v", 20, 10)]
    )
    n = 150
    s = pd.Series(
        np.random.default_rng(3).normal(size=n).round(4),
        index=pd.RangeIndex(n),
        name="v",
    )
    pdf = pd.DataFrame({"ts": np.arange(n), "v": s.to_numpy()})
    _run_both(spark, fc, s, pdf)


def test_convert_series_pipeline(spark):
    """SeriesPipeline with an add-column step and a replace step converts and
    reproduces the reference frame."""
    from tsflex.processing import SeriesPipeline, SeriesProcessor

    def clipped(v):
        out = v.clip(-1.0, 1.0)
        out.name = "v_clip"
        return out

    def scaled(v):
        return (v - v.mean()) / v.std()  # unnamed -> replaces v

    pipe = SeriesPipeline(
        [
            SeriesProcessor(clipped, "v"),
            SeriesProcessor(scaled, "v"),
        ]
    )
    s = _series(seed=7)
    conv = from_tsflex(pipe)
    assert isinstance(conv, SparkPipe)
    assert [type(p) for p in conv.processing_steps] == [SparkProc, SparkProc]

    r = pipe.process([s], return_df=True).reset_index()
    r = r.rename(columns={r.columns[0]: "ts"}).sort_values("ts").reset_index(drop=True)

    pdf = pd.DataFrame({"ts": s.index, "v": s.to_numpy()})
    g = (
        conv.process(spark.createDataFrame(pdf), ts_col="ts")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    _compare(r, g[r.columns])


def test_convert_dispatch_and_passthrough():
    """Dispatch table: FD, MFD (list), FuncWrapper, bare callable,
    SeriesProcessor; Spark objects pass through; junk raises."""
    from tsflex.features import FeatureDescriptor, FuncWrapper, MultipleFeatureDescriptors
    from tsflex.processing import SeriesProcessor

    fd = from_tsflex(FeatureDescriptor(np.mean, "v", "30s", "30s"))
    assert isinstance(fd, SparkFD) and fd.series_name == ("v",)
    assert fd.function.native_spec is not None  # np.mean -> Catalyst

    mfd = from_tsflex(
        MultipleFeatureDescriptors([np.mean, np.max], "v", ["30s"], "30s")
    )
    assert isinstance(mfd, list) and len(mfd) == 2
    assert all(isinstance(x, SparkFD) for x in mfd)
    assert isinstance(SparkFC(mfd), SparkFC)

    fw = from_tsflex(FuncWrapper(np.quantile, output_names="q9", q=0.9))
    assert isinstance(fw, SparkFW) and fw.kwargs == {"q": 0.9}

    assert isinstance(from_tsflex(len), SparkFW)

    sp = from_tsflex(SeriesProcessor(lambda v: v.abs(), "v"))
    assert isinstance(sp, SparkProc) and sp.input_type == "pandas"

    spark_fd = SparkFD("mean", "v", "30s", "30s")
    assert from_tsflex(spark_fd) is spark_fd

    with pytest.raises(TypeError):
        from_tsflex(object())


def test_convert_output_dtypes_override(spark):
    """A UDF feature returning a string needs a declared dtype on Spark —
    the output_dtypes map reaches the converted FuncWrapper."""
    from tsflex.features import FeatureCollection, FeatureDescriptor, FuncWrapper

    def sign_label(x):
        return "pos" if np.sum(x) >= 0 else "neg"

    fc = FeatureCollection(
        [
            FeatureDescriptor(
                FuncWrapper(sign_label, output_names="sign"), "v", "60s", "60s"
            )
        ]
    )
    conv = from_tsflex(fc, output_dtypes={"sign": "string"})
    s = _series(seed=9)
    pdf = pd.DataFrame({"ts": s.index, "v": s.to_numpy()})
    r = fc.calculate(s, return_df=True, n_jobs=1)
    r = r.reset_index().rename(columns={"index": "ts"}).sort_values("ts")
    g = (
        conv.calculate(spark.createDataFrame(pdf), ts_col="ts")
        .toPandas()
        .sort_values("ts")
    )
    col = [c for c in r.columns if c != "ts"][0]
    assert list(r[col]) == list(g[col])
    assert g[col].dtype == object


def test_convert_fuzz_vs_reference(spark):
    """Hypothesis fuzz of the conversion path itself: random sparse
    series, window/stride, function mix (native numpy + custom callable),
    window_idx — the reference-built FC, converted by from_tsflex, must
    reproduce the reference's own output exactly on every drawn config."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from tsflex.features import FeatureCollection, FeatureDescriptor

    def absmean(x):
        return float(np.mean(np.abs(x)))

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        secs=st.sets(st.integers(0, 400), min_size=4, max_size=60),
        window=st.sampled_from([9, 30, 75]),
        stride=st.sampled_from([5, 16]),
        widx=st.sampled_from(["begin", "end"]),
        func_native=st.booleans(),
        data=st.data(),
    )
    def prop(secs, window, stride, widx, func_native, data):
        secs = sorted(secs)
        vals = data.draw(
            st.lists(
                st.floats(min_value=-20, max_value=20, allow_nan=False, width=16),
                min_size=len(secs),
                max_size=len(secs),
            )
        )
        ts = pd.Timestamp("2024-10-01") + pd.to_timedelta(secs, unit="s")
        s = pd.Series([float(x) for x in vals], index=ts, name="v")
        func = np.sum if func_native else absmean
        fc = FeatureCollection(
            FeatureDescriptor(func, "v", f"{window}s", f"{stride}s")
        )
        conv = from_tsflex(fc)
        r = fc.calculate(
            s, return_df=True, n_jobs=1, window_idx=widx, approve_sparsity=True
        )
        r = r.reset_index().rename(columns={"index": "ts"})
        r = r.sort_values("ts").reset_index(drop=True)
        pdf = pd.DataFrame({"ts": ts, "v": s.to_numpy()})
        g = (
            conv.calculate(
                spark.createDataFrame(pdf), ts_col="ts", window_idx=widx,
                approve_sparsity=True,
            )
            .toPandas()
            .sort_values("ts")
            .reset_index(drop=True)
        )
        _compare(r, g)

    prop()


def test_convert_list_of_descriptors():
    """A bare list mixing FDs and MFDs converts element-wise, flattening
    MFD expansions, and feeds the Spark FC constructor directly."""
    from tsflex.features import FeatureDescriptor, MultipleFeatureDescriptors

    mixed = [
        FeatureDescriptor(np.mean, "v", "30s", "30s"),
        MultipleFeatureDescriptors([np.min, np.max], "v", ["60s"], "30s"),
    ]
    conv = from_tsflex(mixed)
    assert isinstance(conv, list) and len(conv) == 3
    assert all(isinstance(x, SparkFD) for x in conv)
    fc = SparkFC(conv)
    assert isinstance(fc, SparkFC)


def test_convert_dataframe_func_row_dropping(spark):
    """A converted reference @dataframe_func processor that DROPS rows
    (dropna) must keep the surviving values intact; dropped samples show
    as NULL in the wide frame (wide-format no-sample encoding) where the
    reference's series-dict model shrinks the series instead — the
    documented data-model boundary."""
    from tsflex.processing import SeriesPipeline, SeriesProcessor

    # same shape the reference's @dataframe_func decorator produces
    # (*series -> merged frame -> row-dropping result), defined LOCALLY so
    # cloudpickle ships it by value — a closure from the tsflex module
    # itself would pin the module in its globals, and Spark python
    # workers cannot import the shimmed reference checkout
    def drop_bad(*series):
        return pd.concat(series, axis=1).dropna(axis=0)

    pipe = SeriesPipeline([SeriesProcessor(drop_bad, "v")])
    ts = pd.date_range("2024-04-01", periods=10, freq="s")
    vals = np.arange(10, dtype="float64")
    vals[3] = np.nan
    s = pd.Series(vals, index=ts, name="v")

    r = pipe.process([s], return_df=True)
    assert len(r) == 9  # reference truly drops the row

    conv = from_tsflex(pipe)
    pdf = pd.DataFrame({"ts": ts, "v": vals})
    g = (
        conv.process(spark.createDataFrame(pdf), ts_col="ts")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(g) == 10
    surv = g[g["ts"] != ts[3]]["v"].to_numpy()
    assert np.allclose(surv, r["v"].to_numpy())
    assert np.isnan(g.loc[g["ts"] == ts[3], "v"]).all()


def test_convert_bare_callable_output_dtypes():
    """output_dtypes reaches bare callables (not just FuncWrappers):
    the single output is named after the function."""

    def label(x):
        return "hi" if np.sum(x) > 0 else "lo"

    fw = from_tsflex(label, output_dtypes={"label": "string"})
    assert isinstance(fw, SparkFW)
    assert fw.output_dtypes == ["string"]
