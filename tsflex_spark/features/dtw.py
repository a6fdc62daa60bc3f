"""Dynamic-time-warping features for the vectorized UDF tier.

DTW is the classic shape-similarity primitive for time series
(template matching, gesture/beat detection). Computing it per window in
a Python loop would be the UDF tier's worst case, so the dynamic
program runs BATCHED: one (n × m) loop of numpy vector operations per
Arrow bucket, each cell update covering every window in the batch at
once — per-window cost is a vectorized add/min, not a Python call.

Two factories:

- :func:`dtw_to_template` — distance of each window to a fixed
  reference pattern (the common scan-for-a-shape workflow; the template
  rides the closure, so the plan stays a narrow Arrow stage).
- :func:`dtw_distance` — two-series DTW per window (tuple series name).

Both support a Sakoe–Chiba ``band`` (|i−j| ≤ band, classic pruning +
regularization) and ``znorm`` (per-window z-normalization, the standard
shape-not-scale matching mode). Cost is squared euclidean per step;
the returned value is ``sqrt(total)`` (euclidean-flavored DTW).
"""

from __future__ import annotations

import numpy as np

from tsflex_spark.features.function_wrapper import FuncWrapper

__all__ = ["dtw_to_template", "dtw_distance"]

_INF = np.inf


def _znorm(x: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    sd = x.std(axis=-1, keepdims=True)
    return (x - mu) / np.where(sd > 0, sd, 1.0)


def _batch_dtw(a: np.ndarray, b: np.ndarray, band: int | None) -> np.ndarray:
    """DTW of a[r] vs b[r] for every row r at once.

    ``a``: (nb, n), ``b``: (nb, m). Rolling two-row DP — memory
    O(nb·m), time O(n·m) numpy vector steps. Returns (nb,) sqrt of the
    accumulated squared-difference cost.
    """
    nb, n = a.shape
    m = b.shape[-1]
    if band is not None and band < abs(n - m):
        # the band must admit the corner-to-corner path
        band = abs(n - m)
    prev = np.full((nb, m + 1), _INF)
    prev[:, 0] = 0.0
    for i in range(1, n + 1):
        cur = np.full((nb, m + 1), _INF)
        lo, hi = 1, m
        if band is not None:
            lo = max(1, i - band)
            hi = min(m, i + band)
            if lo > hi:
                prev = cur
                continue
        d = a[:, i - 1 : i] - b[:, lo - 1 : hi]  # (nb, hi-lo+1)
        cost = d * d
        # cur[j] = cost + min(prev[j-1], prev[j], cur[j-1]) — the cur[j-1]
        # dependency is sequential, so sweep j left-to-right; the other
        # two terms vectorize across the batch
        best_pc = np.minimum(prev[:, lo - 1 : hi], prev[:, lo:hi + 1])
        left = cur[:, lo - 1]
        for jj in range(hi - lo + 1):
            c = cost[:, jj] + np.minimum(best_pc[:, jj], left)
            cur[:, lo + jj] = c
            left = c
        prev = cur
    total = prev[:, m]
    return np.sqrt(np.where(np.isfinite(total), total, np.nan))


def dtw_to_template(
    template: np.ndarray,
    band: int | None = None,
    znorm: bool = True,
    name: str = "dtw_tpl",
) -> FuncWrapper:
    """DTW distance of every window to a fixed ``template`` pattern.

    The (z-normalized) template is baked into the closure — broadcast
    once per task, never shuffled. Windows shorter than 2 samples or
    with zero variance under ``znorm`` still produce a value (flat
    windows z-normalize to zeros)."""
    tpl = np.asarray(template, dtype=np.float64).ravel()
    assert tpl.size >= 2, "template needs >= 2 samples"
    tpl_n = _znorm(tpl[None, :])[0] if znorm else tpl

    def _dtw(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        xn = _znorm(x) if znorm else x
        b = np.broadcast_to(tpl_n, (x.shape[0], tpl_n.size))
        return _batch_dtw(xn, b, band)

    _dtw.__name__ = name
    return FuncWrapper(_dtw, output_names=name, vectorized=True)


def dtw_distance(
    band: int | None = None, znorm: bool = False, name: str = "dtw"
) -> FuncWrapper:
    """Two-series DTW per window — use with a tuple series name. Windows
    where the two series have different sample counts are still valid
    (DTW aligns unequal lengths); all-empty sides yield NaN."""

    def _dtw2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        if a.shape[-1] == 0 or b.shape[-1] == 0:
            return np.full(a.shape[0], np.nan)
        if znorm:
            a, b = _znorm(a), _znorm(b)
        return _batch_dtw(a, b, band)

    _dtw2.__name__ = name
    return FuncWrapper(_dtw2, output_names=name, vectorized=True)
