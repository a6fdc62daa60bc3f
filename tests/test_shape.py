"""Shape feature factories (features/shape.py) vs direct per-window
references (tsfresh feature-calculator semantics)."""

import numpy as np
import pandas as pd
import pytest

from tsflex_spark import FeatureCollection, FeatureDescriptor
from tsflex_spark.features.shape import (
    c3,
    energy_ratio_chunks,
    index_mass_quantile,
    longest_strike_above_mean,
    longest_strike_below_mean,
    number_peaks,
    time_reversal_asymmetry,
)


def _ref_peaks(x, n):
    cnt = 0
    for i in range(n, len(x) - n):
        if all(x[i] > x[i - d] and x[i] > x[i + d] for d in range(1, n + 1)):
            cnt += 1
    return cnt


def _ref_strike(mask):
    best = cur = 0
    for b in mask:
        cur = cur + 1 if b else 0
        best = max(best, cur)
    return best


def test_shape_features_vs_reference(spark):
    rng = np.random.default_rng(47)
    n = 97  # trailing sample completes [0,32), [32,64), [64,96)
    v = rng.normal(0, 1, n).round(2)
    ts = pd.date_range("2024-01-01", periods=n, freq="1s")
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "v": v}))
    fc = FeatureCollection(
        [
            FeatureDescriptor(number_peaks(2), "v", "32s", "32s"),
            FeatureDescriptor(longest_strike_above_mean(), "v", "32s", "32s"),
            FeatureDescriptor(longest_strike_below_mean(), "v", "32s", "32s"),
            FeatureDescriptor(index_mass_quantile(0.6), "v", "32s", "32s"),
            FeatureDescriptor(energy_ratio_chunks(10, 0), "v", "32s", "32s"),
            FeatureDescriptor(c3(2), "v", "32s", "32s"),
            FeatureDescriptor(time_reversal_asymmetry(1), "v", "32s", "32s"),
        ]
    )
    out = (
        fc.calculate(df, ts_col="ts", approve_sparsity=True)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    for i in range(3):
        seg = v[i * 32 : (i + 1) * 32]
        assert out["v__n_peaks_2__w=32s"].iloc[i] == _ref_peaks(seg, 2)
        assert out["v__strike_above__w=32s"].iloc[i] == _ref_strike(seg > seg.mean())
        assert out["v__strike_below__w=32s"].iloc[i] == _ref_strike(seg < seg.mean())
        absx = np.abs(seg)
        idx = int(np.argmax(np.cumsum(absx) >= 0.6 * absx.sum()))
        assert out["v__imq_0.6__w=32s"].iloc[i] == pytest.approx((idx + 1) / 32)
        chunks = np.array_split(seg, 10)
        er = (chunks[0] ** 2).sum() / (seg**2).sum()
        assert out["v__er_0_10__w=32s"].iloc[i] == pytest.approx(er, rel=1e-12)
        m = 32 - 4
        c3_ref = (seg[:m] * seg[2 : 2 + m] * seg[4:]).mean()
        assert out["v__c3_2__w=32s"].iloc[i] == pytest.approx(c3_ref, rel=1e-12)
        m = 32 - 2
        tra_ref = (seg[2:] ** 2 * seg[1 : 1 + m] - seg[1 : 1 + m] * seg[:m] ** 2).mean()
        assert out["v__tra_1__w=32s"].iloc[i] == pytest.approx(tra_ref, rel=1e-12)


def test_shape_degenerate_windows(spark):
    """Short windows (2·lag >= n) and zero-mass windows yield the
    documented NaN/zero results through the per-segment fallback."""
    ts = pd.date_range("2024-01-01", periods=9, freq="1s")
    v = np.zeros(9)
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "v": v}))
    fc = FeatureCollection(
        [
            FeatureDescriptor(c3(4), "v", "4s", "4s"),
            FeatureDescriptor(index_mass_quantile(0.5), "v", "4s", "4s"),
            FeatureDescriptor(longest_strike_above_mean(), "v", "4s", "4s"),
        ]
    )
    out = fc.calculate(df, ts_col="ts", approve_sparsity=True).toPandas()
    assert len(out) == 2
    assert out["v__c3_4__w=4s"].isna().all()  # 2*lag=8 >= 4 samples
    assert out["v__imq_0.5__w=4s"].isna().all()  # zero mass
    assert (out["v__strike_above__w=4s"] == 0).all()  # nothing above mean


def test_entropy_features(spark):
    """binned/sample/permutation entropy through the engine vs direct
    per-window references (np.histogram, naive Richman-Moorman, naive
    Bandt-Pompe)."""
    import math

    from tsflex_spark.features.shape import (
        binned_entropy,
        permutation_entropy,
        sample_entropy,
    )

    rng = np.random.default_rng(53)
    n = 97
    v = rng.normal(0, 1, n)  # continuous: no histogram edge collisions
    ts = pd.date_range("2024-01-01", periods=n, freq="1s")
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "v": v}))
    fc = FeatureCollection(
        [
            FeatureDescriptor(binned_entropy(8), "v", "32s", "32s"),
            FeatureDescriptor(sample_entropy(2, 0.2), "v", "32s", "32s"),
            FeatureDescriptor(permutation_entropy(3, 1), "v", "32s", "32s"),
        ]
    )
    out = (
        fc.calculate(df, ts_col="ts", approve_sparsity=True)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    for i in range(3):
        seg = v[i * 32 : (i + 1) * 32]
        h, _ = np.histogram(seg, bins=8)
        p = h[h > 0] / 32
        assert out["v__bin_ent_8__w=32s"].iloc[i] == pytest.approx(
            -(p * np.log(p)).sum(), rel=1e-12
        )
        # naive sample entropy
        tol = 0.2 * seg.std()

        def phi(mm):
            tmpl = np.array([seg[j : j + mm] for j in range(len(seg) - mm + 1)])
            c = 0
            for x_i in range(len(tmpl)):
                for x_j in range(len(tmpl)):
                    if x_i != x_j and np.max(np.abs(tmpl[x_i] - tmpl[x_j])) <= tol:
                        c += 1
            return c

        b_cnt, a_cnt = phi(2), phi(3)
        if b_cnt and a_cnt:
            assert out["v__sampen_2_0.2__w=32s"].iloc[i] == pytest.approx(
                -np.log(a_cnt / b_cnt), rel=1e-12
            )
        # naive permutation entropy
        k = 32 - 2
        pats = {}
        for j in range(k):
            key = tuple(np.argsort(seg[j : j + 3], kind="stable"))
            pats[key] = pats.get(key, 0) + 1
        pp = np.array(list(pats.values())) / k
        ref_pe = -(pp * np.log(pp)).sum() / np.log(math.factorial(3))
        assert out["v__perm_ent_3_1__w=32s"].iloc[i] == pytest.approx(ref_pe, rel=1e-12)


def test_lempel_ziv_complexity(spark):
    """LZ76 phrase count / n through the engine: periodic windows score
    lower complexity than noise; values match an independent scan."""
    from tsflex_spark.features.shape import lempel_ziv_complexity

    rng = np.random.default_rng(59)
    n = 65
    v = np.concatenate([np.tile([1.0, 5.0], 16), rng.normal(size=33)])
    ts = pd.date_range("2024-01-01", periods=n, freq="1s")
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "v": v}))
    fc = FeatureCollection([FeatureDescriptor(lempel_ziv_complexity(10), "v", "32s", "32s")])
    out = (
        fc.calculate(df, ts_col="ts", approve_sparsity=True)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(out) == 2

    def ref(x, bins=10):
        lo, hi = x.min(), x.max()
        span = (hi - lo) or 1.0
        sym = np.clip(np.floor((x - lo) / span * bins), 0, bins - 1).astype(int)
        subs, ind, inc = set(), 0, 1
        while ind + inc <= len(sym):
            t = tuple(sym[ind : ind + inc])
            if t in subs:
                inc += 1
            else:
                subs.add(t)
                ind += inc
                inc = 1
        return len(subs) / len(sym)

    for i in range(2):
        seg = v[i * 32 : (i + 1) * 32]
        assert out["v__lz_10__w=32s"].iloc[i] == pytest.approx(ref(seg))
    # the periodic window is simpler than the noise window
    assert out["v__lz_10__w=32s"].iloc[0] < out["v__lz_10__w=32s"].iloc[1]
