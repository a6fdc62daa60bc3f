"""DIRECT parity against the actual reference implementation.

The reference tsflex 0.4.1 checkout at /root/reference is pure
pandas/numpy and RUNS in this container once three absent convenience
deps are shimmed (tests/_reference_shim.py). Every test here executes
the SAME feature/processing configuration through the reference (pandas,
n_jobs=1) and through tsflex_spark, and compares values exactly —
stronger evidence than hand-derived oracles because the reference's own
edge-case decisions (window-count formula, bound slicing, naming
grammar, NaN policy) are exercised as implemented, not as documented.

Reference entry points exercised: features.FeatureCollection.calculate
(feature_collection.py:840), features.FuncWrapper, features.utils
.make_robust (utils.py:206), processing.SeriesPipeline (series_
pipeline.py), processing.SeriesProcessor.
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


def _ref_fc(descs):
    from tsflex.features import FeatureCollection, FeatureDescriptor

    return FeatureCollection(
        [FeatureDescriptor(f, s, w, st) for f, s, w, st in descs]
    )


def _ref_calc(fc, series_list, **kw):
    out = fc.calculate(series_list, return_df=True, n_jobs=1, **kw)
    out = out.reset_index().rename(columns={"index": "ts"})
    return out.sort_values("ts").reset_index(drop=True)


def _spark_calc(spark, fc, pdf, **kw):
    out = fc.calculate(spark.createDataFrame(pdf), ts_col="ts", **kw).toPandas()
    return out.sort_values("ts").reset_index(drop=True)


def _compare(ref_df, spark_df):
    assert set(ref_df.columns) == set(spark_df.columns), (
        sorted(ref_df.columns),
        sorted(spark_df.columns),
    )
    assert len(ref_df) == len(spark_df), (len(ref_df), len(spark_df))
    for c in ref_df.columns:
        a, b = ref_df[c], spark_df[c]
        if c == "ts":
            assert list(pd.to_datetime(a)) == list(pd.to_datetime(b)) or list(
                a
            ) == list(b), c
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


def _time_series(n=400, seed=5, gaps=False):
    rng = np.random.default_rng(seed)
    ts = pd.date_range("2024-02-01", periods=n, freq="1s")
    if gaps:
        keep = np.sort(rng.choice(n, size=int(n * 0.7), replace=False))
        ts = ts[keep]
    v = rng.normal(size=len(ts)).round(4)
    return pd.Series(v, index=ts, name="v")


def test_rolling_time_parity(spark):
    """Rolling numpy features over a TIME index: window/stride grid,
    names, values, and window count must match the reference exactly —
    on both dense and GAPPED data (empty windows included)."""
    for gaps in (False, True):
        s = _time_series(gaps=gaps)
        descs = [(np.sum, "v", "30s", "10s"), (np.min, "v", "30s", "10s"),
                 (np.max, "v", "30s", "10s"), (np.mean, "v", "30s", "10s")]
        r = _ref_calc(_ref_fc(descs), [s], approve_sparsity=True)
        pdf = pd.DataFrame({"ts": s.index, "v": s.to_numpy()})
        sfc = SparkFC(
            [SparkFD(f.__name__, "v", "30s", "10s") for f, *_ in descs]
        )
        g = _spark_calc(spark, sfc, pdf, approve_sparsity=True)
        _compare(r, g)


def test_window_idx_and_final_window_parity(spark):
    """window_idx begin/middle/end and include_final_window both ways —
    the output-index grammar the reference pins in strided_rolling."""
    s = _time_series(n=123)
    pdf = pd.DataFrame({"ts": s.index, "v": s.to_numpy()})
    for widx in ("begin", "middle", "end"):
        for final in (False, True):
            r = _ref_calc(
                _ref_fc([(np.sum, "v", "25s", "7s")]),
                [s],
                window_idx=widx,
                include_final_window=final,
                approve_sparsity=True,
            )
            g = _spark_calc(
                spark,
                SparkFC([SparkFD("sum", "v", "25s", "7s")]),
                pdf,
                window_idx=widx,
                include_final_window=final,
                approve_sparsity=True,
            )
            _compare(r, g)


def test_sequence_domain_parity(spark):
    """Numeric (SEQUENCE) index with an irregular grid and multi-stride
    union."""
    rng = np.random.default_rng(11)
    idx = np.sort(rng.choice(1000, size=240, replace=False)).astype("int64")
    s = pd.Series(rng.normal(size=240).round(4), index=idx, name="v")
    pdf = pd.DataFrame({"ts": idx, "v": s.to_numpy()})

    from tsflex.features import FeatureCollection, FeatureDescriptor

    rfc = FeatureCollection(FeatureDescriptor(np.sum, "v", 50, [13, 20]))
    r = _ref_calc(rfc, [s], approve_sparsity=True)
    g = _spark_calc(
        spark,
        SparkFC([SparkFD("sum", "v", 50, [13, 20])]),
        pdf,
        approve_sparsity=True,
    )
    _compare(r, g)


def test_funcwrapper_multioutput_kwargs_parity(spark):
    """FuncWrapper with kwargs + multiple outputs: the UDF tier must
    reproduce the reference's per-segment application bit-for-bit."""
    from tsflex.features import FeatureCollection, FeatureDescriptor, FuncWrapper

    def band(x, lo=0.25, hi=0.75):
        if len(x) == 0:
            return np.nan, np.nan
        return float(np.quantile(x, lo)), float(np.quantile(x, hi))

    s = _time_series(n=300, seed=9)
    pdf = pd.DataFrame({"ts": s.index, "v": s.to_numpy()})
    rfc = FeatureCollection(
        FeatureDescriptor(
            FuncWrapper(band, output_names=["qlo", "qhi"], lo=0.1, hi=0.9),
            "v", "40s", "15s",
        )
    )
    r = _ref_calc(rfc, [s], approve_sparsity=True)
    sfc = SparkFC(
        [
            SparkFD(
                SparkFW(band, output_names=["qlo", "qhi"], lo=0.1, hi=0.9),
                "v", "40s", "15s",
            )
        ]
    )
    g = _spark_calc(spark, sfc, pdf, approve_sparsity=True)
    _compare(r, g)


def test_make_robust_parity(spark):
    """make_robust(min_nb_samples, error_val) through BOTH engines on
    heavily GAPPED data, so under-populated windows trip the sample gate
    (reference utils.py:206). Gaps — not NaN values — carry the sparsity
    here: the reference models a missing sample as an absent index entry
    OR a NaN value, while the Spark engine's wide format defines NULL =
    no sample (README "Native layout"), so index gaps are the
    representation the two data models share."""
    from tsflex.features import FeatureCollection, FeatureDescriptor
    from tsflex.features.utils import make_robust as ref_robust

    from tsflex_spark.features.function_wrapper import make_robust as spark_robust

    s = _time_series(n=400, seed=3, gaps=True)
    s = s[s.index[np.random.default_rng(4).random(len(s)) < 0.6]]
    pdf = pd.DataFrame({"ts": s.index, "v": s.to_numpy()})

    rfc = FeatureCollection(
        FeatureDescriptor(
            ref_robust(np.sum, min_nb_samples=8, error_val=-1.0,
                       passthrough_nans=False),
            "v", "30s", "30s",
        )
    )
    r = _ref_calc(rfc, [s], approve_sparsity=True)
    sfc = SparkFC(
        [
            SparkFD(
                spark_robust(np.sum, min_nb_samples=8, error_val=-1.0,
                             passthrough_nans=False),
                "v", "30s", "30s",
            )
        ]
    )
    g = _spark_calc(spark, sfc, pdf, approve_sparsity=True)
    _compare(r, g)


def test_group_by_consecutive_parity(spark):
    """group_by_consecutive against the reference's gaps-and-islands
    implementation (feature_collection.py:568-724), including the
    exclusive-end bump on the final run."""
    rng = np.random.default_rng(7)
    n = 150
    ts = pd.date_range("2024-03-01", periods=n, freq="90s")
    g = rng.choice(["a", "b", "c"], size=n)
    v = rng.normal(size=n).round(3)
    df = pd.DataFrame({"g": g, "v": v}, index=ts)

    rfc = _ref_fc([(np.sum, "v", "1h", "1h")])
    # reference output: RangeIndex with [feature, g, __start, __end]
    r = rfc.calculate(df, return_df=True, n_jobs=1, group_by_consecutive="g")
    r = r.sort_values("__start").reset_index(drop=True)

    pdf = pd.DataFrame({"ts": ts, "g": g, "v": v})
    sfc = SparkFC([SparkFD("sum", "v", "1h", "1h")])
    out = (
        sfc.calculate(
            spark.createDataFrame(pdf), ts_col="ts", group_by_consecutive="g"
        )
        .toPandas()
        .sort_values("__start")
        .reset_index(drop=True)
    )
    shared = [c for c in r.columns if c in out.columns]
    assert set(shared) == {"v__sum__w=manual", "g", "__start", "__end"}
    _compare(r[shared], out[shared])


def test_series_pipeline_parity(spark):
    """SeriesPipeline of two SeriesProcessors (scale, then clip) — the
    processing subsystem end-to-end vs the reference."""
    from tsflex.processing import SeriesPipeline, SeriesProcessor

    from tsflex_spark.processing import (
        SeriesPipeline as SparkPipeline,
        SeriesProcessor as SparkProcessor,
    )

    s = _time_series(n=250, seed=21)
    pdf = pd.DataFrame({"ts": s.index, "v": s.to_numpy()})

    def scale(x: pd.Series) -> pd.Series:
        return x * 2.0 + 1.0

    def clip(x: pd.Series) -> pd.Series:
        return x.clip(-1.5, 1.5)

    rpipe = SeriesPipeline(
        [SeriesProcessor(scale, "v"), SeriesProcessor(clip, "v")]
    )
    rdf = rpipe.process([s], return_df=True)
    rdf = rdf.reset_index().rename(columns={"index": "ts"})

    spipe = SparkPipeline(
        [SparkProcessor(scale, "v"), SparkProcessor(clip, "v")]
    )
    g = spipe.process(spark.createDataFrame(pdf), ts_col="ts").toPandas()
    merged = rdf.merge(g, on="ts", suffixes=("_ref", "_spark"))
    assert len(merged) == len(rdf)
    assert np.allclose(merged["v_ref"], merged["v_spark"], rtol=1e-12)
