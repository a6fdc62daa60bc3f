"""M4 / LTTB / MinMaxLTTB downsampling: M4 against a pandas oracle,
LTTB structural properties + small hand-checked case, the MinMaxLTTB
scale path's containment and fidelity, and keyed behavior."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsflex_spark.processing.downsample import (
    _lttb_numpy,
    lttb,
    m4,
    minmax_preselect,
)


def _series(spark, n=400, keys=None, seed=0):
    rng = np.random.default_rng(seed)
    ts = pd.date_range("2024-01-01", periods=n, freq="1s")
    frames = []
    for k in keys or [None]:
        v = np.cumsum(rng.normal(0, 1, n)) + (0 if k is None else hash(k) % 7)
        df = pd.DataFrame({"ts": ts, "v": v})
        if k is not None:
            df["k"] = k
        frames.append(df)
    pdf = pd.concat(frames, ignore_index=True)
    return spark.createDataFrame(pdf), pdf


def test_m4_matches_pandas_oracle(spark):
    sdf, pdf = _series(spark, n=200)
    out = m4(sdf, "ts", "v", n_out=10).toPandas()
    assert len(out) == 10
    # pandas oracle: same equal-width binning over micros
    tsn = pdf["ts"].astype("int64") // 1000
    lo, hi = tsn.min(), tsn.max()
    bins = np.minimum(((tsn - lo) / (hi - lo) * 10).astype(int), 9)
    for b, grp in pdf.assign(__b=bins, __tsn=tsn).groupby("__b"):
        row = out[out["bin"] == b].iloc[0]
        first = grp.loc[grp["__tsn"].idxmin()]
        last = grp.loc[grp["__tsn"].idxmax()]
        assert row["first_val"] == pytest.approx(first["v"])
        assert row["last_val"] == pytest.approx(last["v"])
        assert row["min_val"] == pytest.approx(grp["v"].min())
        assert row["max_val"] == pytest.approx(grp["v"].max())
        assert pd.Timestamp(row["min_ts"]) == grp.loc[grp["v"].idxmin(), "ts"]
        assert pd.Timestamp(row["max_ts"]) == grp.loc[grp["v"].idxmax(), "ts"]


def test_m4_keyed(spark):
    sdf, _ = _series(spark, n=100, keys=["a", "b"])
    out = m4(sdf, "ts", "v", n_out=5, key_cols=["k"]).toPandas()
    assert len(out) == 10
    assert set(out["k"]) == {"a", "b"}


def test_lttb_exact_properties(spark):
    sdf, pdf = _series(spark, n=300)
    out = lttb(sdf, "ts", "v", n_out=20).toPandas()
    assert len(out) == 20
    # endpoints always kept
    assert out["ts"].iloc[0] == pdf["ts"].iloc[0]
    assert out["ts"].iloc[-1] == pdf["ts"].iloc[-1]
    # kept rows are a subset of the input (original values, not interpolations)
    merged = out.merge(pdf, on=["ts", "v"], how="left", indicator=True)
    assert (merged["_merge"] == "both").all()


def test_lttb_numpy_hand_case():
    """A spike must be selected over flat neighbors (triangle area)."""
    t = np.arange(9, dtype="float64")
    v = np.array([0, 0, 0, 0, 100, 0, 0, 0, 0], dtype="float64")
    idx = _lttb_numpy(t, v, 3)
    assert idx[0] == 0 and idx[-1] == 8
    assert 4 in idx  # the spike survives


def test_lttb_small_inputs():
    t = np.arange(5, dtype="float64")
    v = np.ones(5)
    assert list(_lttb_numpy(t, v, 10)) == [0, 1, 2, 3, 4]
    assert list(_lttb_numpy(t, v, 2)) == [0, 4]


def test_minmax_preselect_bounds_rows_and_keeps_extremes(spark):
    sdf, pdf = _series(spark, n=1000)
    pre = minmax_preselect(sdf, "ts", "v", n_out=10, ratio=4).toPandas()
    assert len(pre) <= 2 * 4 * 10
    # global min and max always survive preselection
    assert pre["__v"].min() == pytest.approx(pdf["v"].min())
    assert pre["__v"].max() == pytest.approx(pdf["v"].max())


def test_minmaxlttb_close_to_exact(spark):
    sdf, pdf = _series(spark, n=2000, seed=3)
    exact = lttb(sdf, "ts", "v", n_out=50).toPandas()
    fast = lttb(sdf, "ts", "v", n_out=50, ratio=8).toPandas()
    assert len(fast) == 50
    # the paper's claim at ratio>=4: outputs nearly coincide; require
    # strong overlap rather than equality (binning edge effects)
    a = set(exact["ts"])
    b = set(fast["ts"])
    assert len(a & b) >= 35
    # and the fast path's points all come from the preselected extrema
    pre = minmax_preselect(sdf, "ts", "v", n_out=50, ratio=8).toPandas()
    tsn = fast["ts"].astype("int64") // 1000
    assert set(tsn).issubset(set(pre["__tsn"]))


def test_lttb_keyed_counts(spark):
    sdf, _ = _series(spark, n=500, keys=["x", "y", "z"])
    out = lttb(sdf, "ts", "v", n_out=30, key_cols=["k"], ratio=4).toPandas()
    counts = out.groupby("k").size()
    assert all(counts == 30)
