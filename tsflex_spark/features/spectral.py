"""Spectral (frequency-domain) feature functions for the UDF tier.

tsfresh/tsfel-class FFT features (``fft_coefficient``, spectral centroid /
entropy / rolloff, band power) have no Catalyst-native form — they are the
canonical use case for the UDF tier's **vectorized (nb × window) batch
path** (reference strided_rolling.py:379-453): within an Arrow bucket all
equal-length segments are stacked into one 2-D array and ``np.fft.rfft``
runs ONCE over ``axis=-1``, amortizing the Python-call and FFT-plan cost
across segments. Ragged segments transparently fall back to per-segment
``(1, n)`` calls — same math, same results.

Every factory returns a :class:`FuncWrapper` with ``vectorized=True``;
use it like any other feature function::

    fc = FeatureCollection([
        FeatureDescriptor(spectral_stats(fs=100.0), "acc_x", "2s", "1s"),
        FeatureDescriptor(fft_coefficient(3, "abs"), "acc_x", "2s", "1s"),
        FeatureDescriptor(band_power(8.0, 12.0, fs=100.0), "eeg", "2s", "1s"),
    ])

Scale shape: the FFT runs inside the existing bucketed ``applyInPandas``
— no extra shuffle, no driver hop; per-task memory is
O(bucket_rows × window).
"""

from __future__ import annotations

import numpy as np

from tsflex_spark.features.function_wrapper import FuncWrapper

__all__ = [
    "fft_coefficient",
    "spectral_stats",
    "band_power",
    "spectral_rolloff",
    "autocorr_sweep",
    "cross_corr_sweep",
    "pacf_sweep",
]


def _power(x: np.ndarray) -> np.ndarray:
    """Power spectrum of a (nb, n) batch along axis=-1 (rfft bins)."""
    mag = np.abs(np.fft.rfft(x, axis=-1))
    return mag * mag


def fft_coefficient(k: int, attr: str = "abs") -> FuncWrapper:
    """The ``k``-th rfft coefficient's ``abs``/``real``/``imag``/``angle``
    (tsfresh ``fft_coefficient``). Windows too short to have bin ``k``
    yield NaN (→ NULL)."""
    assert attr in ("abs", "real", "imag", "angle"), attr
    assert k >= 0, k

    def _fc(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        n = x.shape[-1]
        if k >= n // 2 + 1:
            return np.full(x.shape[0], np.nan)
        c = np.fft.rfft(x, axis=-1)[..., k]
        if attr == "abs":
            return np.abs(c)
        if attr == "real":
            return np.real(c)
        if attr == "imag":
            return np.imag(c)
        return np.angle(c)

    _fc.__name__ = f"fft_{attr}_{k}"
    return FuncWrapper(_fc, output_names=f"fft_{attr}_{k}", vectorized=True)


def spectral_stats(fs: float = 1.0) -> FuncWrapper:
    """Three batch-FFT summary features per window:

    - ``spec_centroid``: power-weighted mean frequency (Hz at ``fs``),
    - ``spec_entropy``: Shannon entropy of the normalized power spectrum
      (nats) — low for pure tones, ~log(n_bins) for white noise,
    - ``dom_freq``: frequency of the strongest non-DC bin.

    Zero-power windows (constant 0 signal) yield NaN → NULL.
    """

    def _spectral(x: np.ndarray):
        x = np.asarray(x, dtype=np.float64)
        n = x.shape[-1]
        power = _power(x)
        freqs = np.fft.rfftfreq(n, d=1.0 / fs)
        total = power.sum(axis=-1)
        ok = total > 0
        safe_total = np.where(ok, total, 1.0)
        centroid = np.where(ok, (power * freqs).sum(axis=-1) / safe_total, np.nan)
        p = power / safe_total[..., None]
        plogp = np.zeros_like(p)
        np.log(p, out=plogp, where=p > 0)
        entropy = np.where(ok, -(p * plogp).sum(axis=-1), np.nan)
        if power.shape[-1] > 1:
            ac = power[..., 1:]
            dom = np.where(ac.max(axis=-1) > 0, freqs[np.argmax(ac, axis=-1) + 1], np.nan)
        else:
            dom = np.full(power.shape[0], np.nan)
        return centroid, entropy, dom

    _spectral.__name__ = "spectral_stats"
    return FuncWrapper(
        _spectral,
        output_names=["spec_centroid", "spec_entropy", "dom_freq"],
        vectorized=True,
    )


def band_power(lo: float, hi: float, fs: float = 1.0, relative: bool = True) -> FuncWrapper:
    """Power in the frequency band ``[lo, hi)`` Hz; ``relative=True``
    divides by total power (NaN for zero-power windows)."""
    assert hi > lo >= 0.0, (lo, hi)

    def _bp(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        n = x.shape[-1]
        power = _power(x)
        freqs = np.fft.rfftfreq(n, d=1.0 / fs)
        mask = (freqs >= lo) & (freqs < hi)
        band = power[..., mask].sum(axis=-1)
        if not relative:
            return band
        total = power.sum(axis=-1)
        return np.where(total > 0, band / np.where(total > 0, total, 1.0), np.nan)

    kind = "rel" if relative else "abs"
    _bp.__name__ = f"band_power_{kind}_{lo:g}_{hi:g}"
    return FuncWrapper(_bp, output_names=f"band_{kind}_{lo:g}_{hi:g}", vectorized=True)


def spectral_rolloff(q: float = 0.85, fs: float = 1.0) -> FuncWrapper:
    """Frequency below which ``q`` of the total spectral power lies
    (librosa-style rolloff). NaN for zero-power windows."""
    assert 0.0 < q <= 1.0, q

    def _ro(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        n = x.shape[-1]
        power = _power(x)
        freqs = np.fft.rfftfreq(n, d=1.0 / fs)
        total = power.sum(axis=-1)
        csum = np.cumsum(power, axis=-1)
        # first bin where cumulative power >= q * total
        idx = np.argmax(csum >= (q * total)[..., None], axis=-1)
        return np.where(total > 0, freqs[idx], np.nan)

    _ro.__name__ = f"rolloff_{q:g}"
    return FuncWrapper(_ro, output_names=f"rolloff_{q:g}", vectorized=True)


def autocorr_sweep(max_lag: int) -> FuncWrapper:
    """Autocorrelation at every lag 1..``max_lag`` in ONE batched FFT
    (Wiener–Khinchin: acov = irfft(|rfft(x - x̄, 2n)|²)/n), tsfresh
    ``autocorrelation(lag=k)`` semantics::

        acf_k = Σ_{t}(x_t - x̄)(x_{t+k} - x̄) / ((n - k) · var_pop(x))

    Outputs ``acf_1 … acf_{max_lag}``; lags ≥ window length and
    zero-variance windows yield NaN → NULL. For a single lag over huge
    data prefer the all-codegen shift recipe (``with_global_shift`` +
    the ``corr`` native); this sweep amortizes MANY lags per window.
    """
    assert max_lag >= 1, max_lag

    def _acf(x: np.ndarray):
        x = np.asarray(x, dtype=np.float64)
        nb, n = x.shape
        xc = x - x.mean(axis=-1, keepdims=True)
        var = (xc * xc).sum(axis=-1) / n  # population variance
        # zero-pad to >= 2n so the circular correlation is linear
        m = 1 << int(np.ceil(np.log2(2 * n)))
        f = np.fft.rfft(xc, n=m, axis=-1)
        acov = np.fft.irfft(f * np.conj(f), n=m, axis=-1)[:, : max_lag + 1]
        out = []
        ok = var > 0
        safe_var = np.where(ok, var, 1.0)
        for k in range(1, max_lag + 1):
            if k >= n:
                out.append(np.full(nb, np.nan))
            else:
                out.append(
                    np.where(ok, acov[:, k] / ((n - k) * safe_var), np.nan)
                )
        return tuple(out)

    _acf.__name__ = f"autocorr_sweep_{max_lag}"
    return FuncWrapper(
        _acf,
        output_names=[f"acf_{k}" for k in range(1, max_lag + 1)],
        vectorized=True,
    )


def cross_corr_sweep(max_lag: int) -> FuncWrapper:
    """Two-series cross-correlation at lags −L..L in one batched FFT —
    use with a tuple series name, e.g.
    ``FeatureDescriptor(cross_corr_sweep(3), ("a", "b"), "2s", "1s")``.

    ``ccf_p{k}`` correlates ``a_{t+k}`` with ``b_t`` — it peaks when A is
    a k-sample DELAYED copy of B (B leads A by k); ``ccf_m{k}`` is the
    mirror (A leads B), ``ccf_0`` the plain Pearson correlation — each
    normalized by ``(n−|k|)·σa·σb`` (population stds over the whole
    window). Windows where the two series have unequal sample counts
    (ragged nulls) or zero variance yield NaN → NULL.
    """
    assert max_lag >= 1, max_lag

    def _names() -> list:
        return (
            [f"ccf_m{k}" for k in range(max_lag, 0, -1)]
            + ["ccf_0"]
            + [f"ccf_p{k}" for k in range(1, max_lag + 1)]
        )

    def _ccf(a: np.ndarray, b: np.ndarray):
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        nb, n = a.shape
        n_out = 2 * max_lag + 1
        if b.shape != a.shape:
            return tuple(np.full(nb, np.nan) for _ in range(n_out))
        ac = a - a.mean(axis=-1, keepdims=True)
        bc = b - b.mean(axis=-1, keepdims=True)
        sa = np.sqrt((ac * ac).sum(axis=-1) / n)
        sb = np.sqrt((bc * bc).sum(axis=-1) / n)
        ok = (sa > 0) & (sb > 0)
        denom_s = np.where(ok, sa * sb, 1.0)
        m = 1 << int(np.ceil(np.log2(2 * n)))
        cc = np.fft.irfft(
            np.fft.rfft(ac, n=m, axis=-1) * np.conj(np.fft.rfft(bc, n=m, axis=-1)),
            n=m,
            axis=-1,
        )
        out = []
        for k in range(-max_lag, max_lag + 1):
            if abs(k) >= n:
                out.append(np.full(nb, np.nan))
                continue
            # negative k wraps to index m+k — exactly the linear Σ a_{j+k}·b_j
            # term thanks to the 2n zero padding
            val = cc[:, k] / ((n - abs(k)) * denom_s)
            out.append(np.where(ok, val, np.nan))
        return tuple(out)

    _ccf.__name__ = f"cross_corr_sweep_{max_lag}"
    return FuncWrapper(_ccf, output_names=_names(), vectorized=True)


def pacf_sweep(max_lag: int) -> FuncWrapper:
    """Partial autocorrelation at lags 1..``max_lag`` (tsfresh
    ``partial_autocorrelation``): Levinson–Durbin on the biased sample
    acf (denominator n — the statsmodels ``adjusted=False`` convention),
    vectorized across the whole (nb × window) Arrow batch. ``pacf_k`` is
    the AR(k) coefficient of lag k — the correlation at lag k after
    removing the shorter-lag structure. Lags ≥ window length and
    zero-variance windows yield NaN → NULL.
    """
    assert max_lag >= 1, max_lag

    def _pacf(x: np.ndarray):
        x = np.asarray(x, dtype=np.float64)
        nb, n = x.shape
        L = max_lag
        xc = x - x.mean(axis=-1, keepdims=True)
        m = 1 << int(np.ceil(np.log2(2 * n)))
        f = np.fft.rfft(xc, n=m, axis=-1)
        acov = np.fft.irfft(f * np.conj(f), n=m, axis=-1)[:, : min(L, n - 1) + 1] / n
        ok = acov[:, 0] > 0
        r = acov / np.where(ok, acov[:, 0], 1.0)[:, None]  # r[0]=1, biased acf
        kmax = r.shape[1] - 1  # largest computable lag
        out = [np.full(nb, np.nan) for _ in range(L)]
        if kmax >= 1:
            # Levinson–Durbin, vectorized over the batch
            phi = np.zeros((nb, kmax + 1))
            prev = np.zeros((nb, kmax + 1))
            sig = 1.0 - r[:, 1] ** 2
            phi[:, 1] = r[:, 1]
            out[0] = np.where(ok, r[:, 1], np.nan)
            for k in range(2, kmax + 1):
                prev[:, : k] = phi[:, : k]
                num = r[:, k] - (prev[:, 1:k] * r[:, k - 1 : 0 : -1]).sum(axis=-1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    rk = np.where(sig > 0, num / np.where(sig > 0, sig, 1.0), np.nan)
                phi[:, k] = rk
                phi[:, 1:k] = prev[:, 1:k] - rk[:, None] * prev[:, k - 1 : 0 : -1]
                sig = sig * (1.0 - rk**2)
                out[k - 1] = np.where(ok, rk, np.nan)
        return tuple(out)

    _pacf.__name__ = f"pacf_sweep_{max_lag}"
    return FuncWrapper(
        _pacf,
        output_names=[f"pacf_{k}" for k in range(1, max_lag + 1)],
        vectorized=True,
    )
