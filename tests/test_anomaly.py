"""anomaly_zscore: pandas-oracle parity on the trailing window, spike
detection, cold-start NULLs, and the keyed-only contract."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsflex_spark.processing.anomaly import anomaly_zscore


def _data(spark):
    ts = pd.date_range("2024-01-01", periods=120, freq="10s")
    rng = np.random.default_rng(2)
    rows = []
    for k in ("a", "b"):
        v = rng.normal(10.0 if k == "a" else -5.0, 1.0, len(ts))
        v[60] += 50.0  # an unmistakable spike per key
        rows += [(k, t.to_pydatetime(), float(x)) for t, x in zip(ts, v)]
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    return spark.createDataFrame(pdf), pdf


def test_matches_pandas_trailing_window(spark):
    sdf, pdf = _data(spark)
    out = (
        anomaly_zscore(sdf, "ts", "v", "2 minutes", ["k"], min_points=5)
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    for k, grp in pdf.groupby("k"):
        grp = grp.sort_values("ts").reset_index(drop=True)
        got = out[out["k"] == k].reset_index(drop=True)
        t_us = grp["ts"].astype("int64") // 1000
        for i in range(len(grp)):
            m = (t_us >= t_us[i] - 120_000_000) & (t_us < t_us[i])
            seg = grp.loc[m, "v"]
            if len(seg) >= 5 and seg.std(ddof=0) > 0:
                z_ref = (grp.loc[i, "v"] - seg.mean()) / seg.std(ddof=0)
                assert got.loc[i, "zscore"] == pytest.approx(z_ref, rel=1e-9), (k, i)
            else:
                assert got.loc[i, "zscore"] is None or pd.isna(got.loc[i, "zscore"])


def test_spike_flagged_per_key(spark):
    sdf, pdf = _data(spark)
    out = anomaly_zscore(sdf, "ts", "v", "5 minutes", ["k"]).toPandas()
    spikes = out[out["is_anomaly"] == True]  # noqa: E712
    # the planted spike at index 60 of each key is caught
    assert set(spikes["k"]) == {"a", "b"}
    for k in ("a", "b"):
        mx = out[out["k"] == k].nlargest(1, "v").iloc[0]
        assert mx["is_anomaly"] == True  # noqa: E712
    # and anomalies are rare (normal points don't trip a 3-sigma wire)
    assert len(spikes) <= 8


def test_cold_start_is_null(spark):
    sdf, _ = _data(spark)
    out = (
        anomaly_zscore(sdf, "ts", "v", "2 minutes", ["k"], min_points=5)
        .orderBy("k", "ts")
        .limit(5)
        .toPandas()
    )
    assert out["zscore"].isna().all()


def test_constant_baseline_is_null(spark):
    pdf = pd.DataFrame(
        {
            "k": ["c"] * 10,
            "ts": pd.date_range("2024-01-01", periods=10, freq="10s"),
            "v": [1.0] * 9 + [99.0],
        }
    )
    out = anomaly_zscore(
        spark.createDataFrame(pdf), "ts", "v", "10 minutes", ["k"]
    ).toPandas()
    # zero-variance window → NULL even for the wild last point
    assert out["zscore"].isna().all()


def test_unkeyed_rejected(spark):
    sdf, _ = _data(spark)
    with pytest.raises(ValueError):
        anomaly_zscore(sdf, "ts", "v", "2 minutes", [])


def test_seasonal_profile_and_anomaly(spark):
    from tsflex_spark.processing.anomaly import anomaly_seasonal, seasonal_profile

    # two weeks of hourly data with a clear diurnal pattern; one planted
    # "high at 3am" point that a trailing z-score would average away
    ts = pd.date_range("2024-01-01", periods=14 * 24, freq="1h")
    rng = np.random.default_rng(4)
    base = 100 + 50 * np.sin(2 * np.pi * (ts.hour.to_numpy() / 24.0))
    v = base + rng.normal(0, 2.0, len(ts))
    spike_idx = 24 * 10 + 3  # 3am on day 10
    v[spike_idx] += 60
    pdf = pd.DataFrame({"ts": ts, "v": v})
    sdf = spark.createDataFrame(pdf)

    prof = seasonal_profile(sdf, "ts", "v", period="hour_of_day").toPandas()
    assert len(prof) == 24
    # profile mean tracks the sinusoid
    p6 = prof[prof["slot"] == 6]["mean"].iloc[0]    # sin peak → ~150
    p18 = prof[prof["slot"] == 18]["mean"].iloc[0]  # sin trough → ~50
    assert p6 > 140 and p18 < 60

    out = anomaly_seasonal(
        sdf, "ts", "v", period="hour_of_day", threshold=3.5
    ).toPandas().sort_values("ts").reset_index(drop=True)
    flagged = out[out["is_anomaly"] == True]  # noqa: E712
    assert pd.Timestamp(ts[spike_idx]) in set(flagged["ts"])
    assert len(flagged) <= 5


def test_seasonal_frozen_profile_scores_new_data(spark):
    from tsflex_spark.processing.anomaly import anomaly_seasonal, seasonal_profile

    hist = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=240, freq="1h"),
            "v": np.tile(np.arange(24, dtype=float), 10),
        }
    )
    prof = seasonal_profile(spark.createDataFrame(hist), "ts", "v", period="hour_of_day")
    # constant per slot → std 0 → NULL verdicts on new data
    new = pd.DataFrame(
        {"ts": pd.date_range("2024-02-01", periods=24, freq="1h"), "v": np.zeros(24)}
    )
    out = anomaly_seasonal(
        spark.createDataFrame(new), "ts", "v", period="hour_of_day", profile=prof
    ).toPandas()
    assert out["zscore"].isna().all()


def test_seasonal_unknown_period(spark):
    from tsflex_spark.processing.anomaly import seasonal_profile

    pdf = pd.DataFrame(
        {"ts": pd.date_range("2024-01-01", periods=5, freq="1h"), "v": range(5)}
    )
    with pytest.raises(ValueError):
        seasonal_profile(spark.createDataFrame(pdf), "ts", "v", period="fortnight")


def _cusum_ref(z, k, h):
    """Sequential Page CUSUM reference."""
    sp = sn = 0.0
    out = []
    for v in z:
        sp = max(0.0, sp + v - k)
        sn = max(0.0, sn - v - k)
        out.append((sp, sn, sp > h or sn > h))
    return out


def test_cusum_matches_sequential_reference(spark):
    from tsflex_spark.processing.anomaly import cusum

    rng = np.random.default_rng(7)
    n = 300
    v = rng.normal(10, 2, n)
    v[200:] += 4.0  # a 2-sigma upward shift at t=200
    pdf = pd.DataFrame(
        {"k": "a", "ts": pd.date_range("2024-01-01", periods=n, freq="1s"), "v": v}
    )
    mu, sd = 10.0, 2.0
    out = (
        cusum(
            spark.createDataFrame(pdf), "ts", "v", ["k"],
            target=mu, sigma=sd, k=0.5, h=8.0,
        )
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    ref = _cusum_ref((v - mu) / sd, 0.5, 8.0)
    for i, (sp, sn, alarm) in enumerate(ref):
        assert out.loc[i, "cusum_pos"] == pytest.approx(sp, abs=1e-9), i
        assert out.loc[i, "cusum_neg"] == pytest.approx(sn, abs=1e-9), i
        assert bool(out.loc[i, "is_shifted"]) == alarm, i
    # the shift IS detected, shortly after t=200 and not before t=190
    first = out.index[out["is_shifted"]].min()
    assert 195 <= first <= 215


def test_cusum_downward_shift_and_self_estimation(spark):
    from tsflex_spark.processing.anomaly import cusum

    rng = np.random.default_rng(8)
    n = 400
    v = rng.normal(0, 1, n)
    v[300:] -= 3.0
    pdf = pd.DataFrame(
        {"k": "x", "ts": pd.date_range("2024-01-01", periods=n, freq="1s"), "v": v}
    )
    out = (
        cusum(spark.createDataFrame(pdf), "ts", "v", ["k"], target=0.0, sigma=1.0)
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    hits = out.index[out["is_shifted"]]
    assert len(hits) and hits.min() >= 300
    # per-key self-estimated baseline also runs (sanity, no exact ref)
    out2 = cusum(spark.createDataFrame(pdf), "ts", "v", ["k"]).toPandas()
    assert {"cusum_pos", "cusum_neg", "is_shifted"} <= set(out2.columns)
    with pytest.raises(ValueError):
        cusum(spark.createDataFrame(pdf), "ts", "v", [])
