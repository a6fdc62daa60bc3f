"""Spectral feature factories (features/spectral.py): FFT features through
the UDF tier's vectorized (nb × window) batch path, vs a per-window numpy
reference."""

import numpy as np
import pandas as pd
import pytest

from tsflex_spark import FeatureCollection, FeatureDescriptor
from tsflex_spark.features.spectral import (
    autocorr_sweep,
    band_power,
    fft_coefficient,
    spectral_rolloff,
    spectral_stats,
)


def _ref_spectral(seg: np.ndarray, fs: float):
    mag = np.abs(np.fft.rfft(seg))
    power = mag * mag
    freqs = np.fft.rfftfreq(len(seg), d=1.0 / fs)
    total = power.sum()
    centroid = (power * freqs).sum() / total
    p = power / total
    entropy = -(p[p > 0] * np.log(p[p > 0])).sum()
    dom = freqs[np.argmax(power[1:]) + 1]
    return centroid, entropy, dom


def test_spectral_features_parity(spark):
    """120 samples @ 10 Hz, 4 s tumbling windows: spectral_stats /
    fft_coefficient / band_power / rolloff match the per-window numpy
    reference; a 2 Hz + 0.5 Hz mix puts deterministic structure in-band."""
    fs = 10.0
    n = 120
    t = np.arange(n) / fs
    v = np.sin(2 * np.pi * 2.0 * t) + 0.5 * np.sin(2 * np.pi * 0.5 * t) + 3.0
    ts = pd.date_range("2024-01-01", periods=n, freq=pd.Timedelta(seconds=1 / fs))
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "v": v}))

    fc = FeatureCollection(
        [
            FeatureDescriptor(spectral_stats(fs=fs), "v", "4s", "4s"),
            FeatureDescriptor(fft_coefficient(8, "abs"), "v", "4s", "4s"),
            FeatureDescriptor(band_power(1.5, 2.5, fs=fs), "v", "4s", "4s"),
            FeatureDescriptor(spectral_rolloff(0.85, fs=fs), "v", "4s", "4s"),
        ]
    )
    out = (
        fc.calculate(df, ts_col="ts", approve_sparsity=True)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # inner bounds [t0, t0+12s): two full 4s windows → rows at 4s, 8s
    assert len(out) == 2
    win = int(4 * fs)
    for i in range(2):
        seg = v[i * win : (i + 1) * win]
        centroid, entropy, dom = _ref_spectral(seg, fs)
        assert out["v__spec_centroid__w=4s"].iloc[i] == pytest.approx(centroid, rel=1e-12)
        assert out["v__spec_entropy__w=4s"].iloc[i] == pytest.approx(entropy, rel=1e-9)
        assert out["v__dom_freq__w=4s"].iloc[i] == pytest.approx(dom)
        # 2 Hz bin at k=8 for a 40-sample window @10 Hz carries the main tone
        assert out["v__fft_abs_8__w=4s"].iloc[i] == pytest.approx(
            np.abs(np.fft.rfft(seg)[8]), rel=1e-12
        )
        power = np.abs(np.fft.rfft(seg)) ** 2
        freqs = np.fft.rfftfreq(win, d=1.0 / fs)
        band = power[(freqs >= 1.5) & (freqs < 2.5)].sum() / power.sum()
        assert out["v__band_rel_1.5_2.5__w=4s"].iloc[i] == pytest.approx(band, rel=1e-12)
        csum = np.cumsum(power)
        roll = freqs[np.argmax(csum >= 0.85 * power.sum())]
        assert out["v__rolloff_0.85__w=4s"].iloc[i] == pytest.approx(roll)
        # the dominant tone is 2 Hz — sanity on the physics
        assert abs(out["v__dom_freq__w=4s"].iloc[i] - 2.0) < 1e-9


def test_spectral_ragged_and_constant_windows(spark):
    """Ragged windows (gap in the middle) use the per-segment fallback —
    same values as the batch path; a constant-zero window yields NULLs."""
    fs = 1.0
    ts_a = pd.date_range("2024-01-01 00:00:00", periods=16, freq="1s")
    # one trailing sample at 32s so the second window [16s, 32s) is a
    # complete grid window (its 6 zero samples sit at 26..31s)
    ts_b = pd.date_range("2024-01-01 00:00:26", periods=7, freq="1s")
    v_a = np.sin(2 * np.pi * 0.25 * np.arange(16))
    v_b = np.zeros(7)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"ts": ts_a.append(ts_b), "v": np.concatenate([v_a, v_b])}
        )
    )
    fc = FeatureCollection([FeatureDescriptor(spectral_stats(fs=fs), "v", "16s", "16s")])
    out = (
        fc.calculate(df, ts_col="ts", approve_sparsity=True)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    # window 1: full 16-sample 0.25 Hz tone
    c, e, d = _ref_spectral(v_a, fs)
    assert out["v__spec_centroid__w=16s"].iloc[0] == pytest.approx(c, rel=1e-12)
    assert out["v__dom_freq__w=16s"].iloc[0] == pytest.approx(d)
    # window 2: ragged (6 of 16 samples), all zero → zero power → NULL
    assert pd.isna(out["v__spec_centroid__w=16s"].iloc[1])
    assert pd.isna(out["v__dom_freq__w=16s"].iloc[1])


def test_autocorr_sweep_parity(spark):
    """autocorr_sweep: FFT-computed acf at lags 1..5 equals the direct
    tsfresh formula per window; lags >= n and zero-variance windows are
    NULL."""
    rng = np.random.default_rng(23)
    fs_n = 96
    v = np.cumsum(rng.normal(0, 1, fs_n)).round(3)  # correlated series
    ts = pd.date_range("2024-01-01", periods=fs_n, freq="1s")
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "v": v}))
    fc = FeatureCollection(
        [FeatureDescriptor(spectral_stats(fs=1.0), "v", "32s", "32s"),
         FeatureDescriptor(autocorr_sweep(5), "v", "32s", "32s")]
    )
    out = (
        fc.calculate(df, ts_col="ts", approve_sparsity=True)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    n = 32
    for i in range(2):
        seg = v[i * n : (i + 1) * n]
        xc = seg - seg.mean()
        var = (xc * xc).sum() / n
        for k in range(1, 6):
            ref = (xc[:-k] * xc[k:]).sum() / ((n - k) * var)
            got = out[f"v__acf_{k}__w=32s"].iloc[i]
            assert got == pytest.approx(ref, rel=1e-9, abs=1e-12), (i, k)


def test_autocorr_sweep_degenerate(spark):
    """Constant windows (zero variance) and lags beyond the window length
    yield NULLs."""
    ts = pd.date_range("2024-01-01", periods=8, freq="1s")
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "v": np.ones(8)}))
    fc = FeatureCollection([FeatureDescriptor(autocorr_sweep(6), "v", "4s", "4s")])
    out = fc.calculate(df, ts_col="ts", approve_sparsity=True).toPandas()
    assert len(out) == 1
    for k in range(1, 7):
        assert pd.isna(out[f"v__acf_{k}__w=4s"].iloc[0])


def test_cross_corr_sweep(spark):
    """Two-series vectorized factory: ccf over tuple series. b delayed
    into a by 2 samples → the sweep peaks at ccf_p2; values match the
    direct formula; ragged (unequal-count) windows are NULL."""
    from tsflex_spark.features.spectral import cross_corr_sweep

    rng = np.random.default_rng(31)
    n = 65  # one trailing sample so window [32s, 64s) is a complete grid window
    b = rng.normal(size=n)
    a = np.empty(n)
    a[2:] = b[:-2]
    a[:2] = rng.normal(size=2)
    ts = pd.date_range("2024-01-01", periods=n, freq="1s")
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "a": a, "b": b}))
    fc = FeatureCollection(
        [FeatureDescriptor(cross_corr_sweep(3), ("a", "b"), "32s", "32s")]
    )
    out = (
        fc.calculate(df, ts_col="ts", approve_sparsity=True)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(out) == 2

    def ref(aa, bb, k):
        m = len(aa)
        ac, bc = aa - aa.mean(), bb - bb.mean()
        s = (ac[k:] * bc[: m - k]).sum() if k >= 0 else (ac[: m + k] * bc[-k:]).sum()
        return s / ((m - abs(k)) * ac.std() * bc.std())

    for i in range(2):
        sa, sb = a[i * 32 : (i + 1) * 32], b[i * 32 : (i + 1) * 32]
        for k in range(-3, 4):
            nm = f"ccf_p{k}" if k > 0 else (f"ccf_m{-k}" if k < 0 else "ccf_0")
            assert out[f"a|b__{nm}__w=32s"].iloc[i] == pytest.approx(
                ref(sa, sb, k), rel=1e-9, abs=1e-12
            ), (i, k)
        assert out["a|b__ccf_p2__w=32s"].iloc[i] > 0.9  # the injected delay


def test_cross_corr_sweep_ragged_null(spark):
    """Unequal per-series sample counts in a window (one NULL in b) →
    every ccf output NULL for that window, others unaffected."""
    from pyspark.sql import functions as F

    from tsflex_spark.features.spectral import cross_corr_sweep

    rng = np.random.default_rng(33)
    n = 33  # trailing sample completes window [16s, 32s)
    ts = pd.date_range("2024-01-01", periods=n, freq="1s")
    pdf = pd.DataFrame(
        {"ts": ts, "a": rng.normal(size=n), "b": rng.normal(size=n)}
    )
    pdf.loc[3, "b"] = None  # window 1 ragged
    df = spark.createDataFrame(pdf)
    fc = FeatureCollection(
        [FeatureDescriptor(cross_corr_sweep(2), ("a", "b"), "16s", "16s")]
    )
    out = (
        fc.calculate(df, ts_col="ts", approve_sparsity=True)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert pd.isna(out["a|b__ccf_0__w=16s"].iloc[0])
    assert not pd.isna(out["a|b__ccf_0__w=16s"].iloc[1])


def test_pacf_sweep(spark):
    """pacf_sweep: Levinson-Durbin equals the direct Yule-Walker Toeplitz
    solve per window (independent reference); constant windows are NULL,
    and an AR(1) series has pacf_1 large / pacf_2.. near zero."""
    from numpy.linalg import solve

    from tsflex_spark.features.spectral import pacf_sweep

    rng = np.random.default_rng(41)
    n = 65
    # AR(1) with phi=0.8
    v = np.empty(n)
    v[0] = rng.normal()
    for i in range(1, n):
        v[i] = 0.8 * v[i - 1] + rng.normal()
    ts = pd.date_range("2024-01-01", periods=n, freq="1s")
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "v": v}))
    L = 4
    fc = FeatureCollection([FeatureDescriptor(pacf_sweep(L), "v", "32s", "32s")])
    out = (
        fc.calculate(df, ts_col="ts", approve_sparsity=True)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(out) == 2

    def ref_pacf(xx):
        m = len(xx)
        xc = xx - xx.mean()
        acov = np.array([(xc[: m - k] * xc[k:]).sum() / m for k in range(L + 1)])
        r = acov / acov[0]
        vals = []
        for k in range(1, L + 1):
            R = np.array([[r[abs(i - j)] for j in range(k)] for i in range(k)])
            vals.append(solve(R, r[1 : k + 1])[-1])
        return vals

    for i in range(2):
        seg = v[i * 32 : (i + 1) * 32]
        exp = ref_pacf(seg)
        for k in range(1, L + 1):
            assert out[f"v__pacf_{k}__w=32s"].iloc[i] == pytest.approx(
                exp[k - 1], rel=1e-9, abs=1e-12
            ), (i, k)
        assert out[f"v__pacf_1__w=32s"].iloc[i] > 0.4  # AR(1) signal
