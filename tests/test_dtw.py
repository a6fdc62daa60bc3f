"""DTW factories (features/dtw.py): batched DP vs a naive reference,
template matching through the engine."""

import numpy as np
import pandas as pd
import pytest

from tsflex_spark import FeatureCollection, FeatureDescriptor
from tsflex_spark.features.dtw import dtw_distance, dtw_to_template


def _dtw_ref(a, b, band=None):
    n, m = len(a), len(b)
    if band is not None and band < abs(n - m):
        band = abs(n - m)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if band is not None and abs(i - j) > band:
                continue
            c = (a[i - 1] - b[j - 1]) ** 2
            D[i, j] = c + min(D[i - 1, j - 1], D[i - 1, j], D[i, j - 1])
    return np.sqrt(D[n, m])


def _zn(x):
    sd = x.std()
    return (x - x.mean()) / (sd if sd > 0 else 1.0)


def test_dtw_template_matching(spark):
    """A sine template embedded in window 2 (phase-shifted) scores far
    lower DTW distance than noise windows; values match the naive DP on
    z-normalized inputs."""
    rng = np.random.default_rng(71)
    n = 97
    v = rng.normal(0, 1, n)
    tpl = np.sin(np.linspace(0, 2 * np.pi, 24))
    v[40:64] = 3.0 * np.sin(np.linspace(0.4, 0.4 + 2 * np.pi, 24))  # scaled+shifted
    ts = pd.date_range("2024-01-01", periods=n, freq="1s")
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "v": v}))
    fc = FeatureCollection(
        [FeatureDescriptor(dtw_to_template(tpl, band=8), "v", "32s", "32s")]
    )
    out = (
        fc.calculate(df, ts_col="ts", approve_sparsity=True)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    tpl_n = _zn(tpl)
    for i in range(3):
        seg = _zn(v[i * 32 : (i + 1) * 32])
        assert out["v__dtw_tpl__w=32s"].iloc[i] == pytest.approx(
            _dtw_ref(seg, tpl_n, band=8), rel=1e-10
        )
    # the window containing the (scaled) sine is the best match
    assert out["v__dtw_tpl__w=32s"].idxmin() == 1


def test_dtw_two_series(spark):
    """Two-series DTW per window vs the naive DP; identical series → 0."""
    rng = np.random.default_rng(73)
    n = 65
    a = rng.normal(size=n)
    b = np.concatenate([a[:32], rng.normal(size=n - 32)])  # window 1 identical
    ts = pd.date_range("2024-01-01", periods=n, freq="1s")
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "a": a, "b": b}))
    fc = FeatureCollection(
        [FeatureDescriptor(dtw_distance(band=6), ("a", "b"), "32s", "32s")]
    )
    out = (
        fc.calculate(df, ts_col="ts", approve_sparsity=True)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert out["a|b__dtw__w=32s"].iloc[0] == pytest.approx(0.0, abs=1e-12)
    seg_a, seg_b = a[32:64], b[32:64]
    assert out["a|b__dtw__w=32s"].iloc[1] == pytest.approx(
        _dtw_ref(seg_a, seg_b, band=6), rel=1e-10
    )
