"""Time-domain shape features for the vectorized UDF tier.

The remaining commonly-used tsfresh features whose semantics need the
whole window at once (run lengths, peak neighborhoods, cumulative mass,
triple products). Like ``features/spectral.py`` every factory returns a
``vectorized=True`` :class:`FuncWrapper`: equal-length segments in an
Arrow bucket are processed as ONE (nb × window) numpy batch; ragged
segments fall back to per-segment ``(1, n)`` calls with identical math.

All reference semantics follow the tsfresh feature-calculator
definitions (public docs/source), computed batch-vectorized:

- ``number_peaks(n)``  — peaks strictly greater than their n neighbors
  on both sides (interior points only).
- ``longest_strike_above_mean`` / ``below`` — longest run of samples
  strictly above/below the window mean.
- ``index_mass_quantile(q)`` — relative index where the cumulative
  |x| mass first reaches q of the total (NaN when total mass is 0).
- ``energy_ratio_chunks(num_segments, focus)`` — Σx² of chunk ``focus``
  over the whole window's Σx² (chunks by ``np.array_split`` semantics).
- ``c3(lag)`` — E[x_t · x_{t+lag} · x_{t+2lag}] (nonlinearity proxy).
- ``time_reversal_asymmetry(lag)`` — E[x_{t+2l}²·x_{t+l} − x_{t+l}·x_t²].
"""

from __future__ import annotations

import numpy as np

from tsflex_spark.features.function_wrapper import FuncWrapper

__all__ = [
    "number_peaks",
    "longest_strike_above_mean",
    "longest_strike_below_mean",
    "index_mass_quantile",
    "energy_ratio_chunks",
    "c3",
    "time_reversal_asymmetry",
    "binned_entropy",
    "sample_entropy",
    "permutation_entropy",
    "lempel_ziv_complexity",
]


def _longest_run(mask: np.ndarray) -> np.ndarray:
    """Longest run of True per row of a (nb, n) boolean batch — one
    vectorized pass: positions reset the running count at False via a
    cumulative 'last False index' trick."""
    nb, n = mask.shape
    idx = np.arange(n)
    # last index of a False at-or-before t (or -1): running maximum
    last_false = np.maximum.accumulate(np.where(~mask, idx, -1), axis=-1)
    run = np.where(mask, idx - last_false, 0)
    return run.max(axis=-1)


def number_peaks(n_support: int) -> FuncWrapper:
    """tsfresh ``number_peaks(n)``: count of samples strictly greater
    than ALL of their ``n_support`` neighbors on each side."""
    assert n_support >= 1, n_support

    def _np_(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        nb, n = x.shape
        if n <= 2 * n_support:
            return np.zeros(nb)
        core = x[:, n_support : n - n_support]
        is_peak = np.ones(core.shape, dtype=bool)
        for d in range(1, n_support + 1):
            is_peak &= core > x[:, n_support - d : n - n_support - d]
            is_peak &= core > x[:, n_support + d : n - n_support + d]
        return is_peak.sum(axis=-1).astype(np.float64)

    _np_.__name__ = f"number_peaks_{n_support}"
    return FuncWrapper(_np_, output_names=f"n_peaks_{n_support}", vectorized=True)


def longest_strike_above_mean() -> FuncWrapper:
    def _ls(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        return _longest_run(x > x.mean(axis=-1, keepdims=True)).astype(np.float64)

    _ls.__name__ = "longest_strike_above_mean"
    return FuncWrapper(_ls, output_names="strike_above", vectorized=True)


def longest_strike_below_mean() -> FuncWrapper:
    def _ls(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        return _longest_run(x < x.mean(axis=-1, keepdims=True)).astype(np.float64)

    _ls.__name__ = "longest_strike_below_mean"
    return FuncWrapper(_ls, output_names="strike_below", vectorized=True)


def index_mass_quantile(q: float = 0.5) -> FuncWrapper:
    """Relative index (fraction of the window, 1-based like tsfresh)
    where cumulative |x| first reaches ``q`` of the total mass."""
    assert 0.0 < q <= 1.0, q

    def _imq(x: np.ndarray) -> np.ndarray:
        x = np.abs(np.asarray(x, dtype=np.float64))
        nb, n = x.shape
        total = x.sum(axis=-1)
        csum = np.cumsum(x, axis=-1)
        idx = np.argmax(csum >= (q * total)[..., None], axis=-1)
        return np.where(total > 0, (idx + 1) / n, np.nan)

    _imq.__name__ = f"index_mass_quantile_{q:g}"
    return FuncWrapper(_imq, output_names=f"imq_{q:g}", vectorized=True)


def energy_ratio_chunks(num_segments: int = 10, focus: int = 0) -> FuncWrapper:
    """tsfresh ``energy_ratio_by_chunks``: Σx² of chunk ``focus`` (of
    ``num_segments`` near-equal chunks, np.array_split sizing) divided
    by the window's total Σx² (NaN for zero-energy windows)."""
    assert 0 <= focus < num_segments, (focus, num_segments)

    def _erc(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        nb, n = x.shape
        p = x * x
        total = p.sum(axis=-1)
        # np.array_split boundaries for n into num_segments chunks
        base, extra = divmod(n, num_segments)
        sizes = [base + 1 if i < extra else base for i in range(num_segments)]
        starts = np.cumsum([0] + sizes[:-1])
        lo, hi = starts[focus], starts[focus] + sizes[focus]
        band = p[:, lo:hi].sum(axis=-1)
        return np.where(total > 0, band / np.where(total > 0, total, 1.0), np.nan)

    _erc.__name__ = f"energy_ratio_{focus}_{num_segments}"
    return FuncWrapper(
        _erc, output_names=f"er_{focus}_{num_segments}", vectorized=True
    )


def c3(lag: int = 1) -> FuncWrapper:
    """tsfresh ``c3(lag)``: mean of x_t · x_{t+lag} · x_{t+2·lag} over
    t = 0..n−2·lag−1 (a nonlinearity measure); NaN when 2·lag ≥ n."""
    assert lag >= 1, lag

    def _c3(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        nb, n = x.shape
        if 2 * lag >= n:
            return np.full(nb, np.nan)
        m = n - 2 * lag
        return (x[:, :m] * x[:, lag : lag + m] * x[:, 2 * lag :]).mean(axis=-1)

    _c3.__name__ = f"c3_{lag}"
    return FuncWrapper(_c3, output_names=f"c3_{lag}", vectorized=True)


def time_reversal_asymmetry(lag: int = 1) -> FuncWrapper:
    """tsfresh ``time_reversal_asymmetry_statistic(lag)``:
    mean(x_{t+2l}²·x_{t+l} − x_{t+l}·x_t²); NaN when 2·lag ≥ n."""
    assert lag >= 1, lag

    def _tra(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        nb, n = x.shape
        if 2 * lag >= n:
            return np.full(nb, np.nan)
        m = n - 2 * lag
        a, b, c = x[:, :m], x[:, lag : lag + m], x[:, 2 * lag :]
        return (c * c * b - b * a * a).mean(axis=-1)

    _tra.__name__ = f"time_reversal_asymmetry_{lag}"
    return FuncWrapper(_tra, output_names=f"tra_{lag}", vectorized=True)


def binned_entropy(max_bins: int = 10) -> FuncWrapper:
    """tsfresh ``binned_entropy``: Shannon entropy (nats) of the window
    histogram over ``max_bins`` equal-width bins spanning [min, max]
    (numpy ``histogram`` semantics: rightmost bin closed). Constant
    windows land in one bin → entropy 0. Batch-vectorized via a
    scatter-add bincount — no per-segment histogram calls."""
    assert max_bins >= 1, max_bins

    def _be(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        nb, n = x.shape
        lo = x.min(axis=-1, keepdims=True)
        hi = x.max(axis=-1, keepdims=True)
        span = hi - lo
        with np.errstate(invalid="ignore", divide="ignore"):
            idx = np.floor((x - lo) / np.where(span > 0, span, 1.0) * max_bins)
        idx = np.clip(idx.astype(np.int64), 0, max_bins - 1)  # right-closed top bin
        counts = np.zeros((nb, max_bins))
        np.add.at(counts, (np.arange(nb)[:, None], idx), 1.0)
        p = counts / n
        plogp = np.zeros_like(p)
        np.log(p, out=plogp, where=p > 0)
        return -(p * plogp).sum(axis=-1)

    _be.__name__ = f"binned_entropy_{max_bins}"
    return FuncWrapper(_be, output_names=f"bin_ent_{max_bins}", vectorized=True)


def sample_entropy(m: int = 2, r: float = 0.2) -> FuncWrapper:
    """Sample entropy (Richman–Moorman, the tsfresh/antropy definition):
    −ln(A/B) with B = #pairs of m-length templates within Chebyshev
    distance ``r·std_pop(x)`` (self-matches excluded) and A the same at
    length m+1. Infinite (no m+1 matches) or undefined windows → NaN.
    O(n²) per window — sized for feature windows (hundreds of samples),
    each window's distance matrix fully vectorized."""
    assert m >= 1 and r > 0, (m, r)

    def _one(x: np.ndarray) -> float:
        n = x.size
        if n <= m + 1:
            return np.nan
        tol = r * x.std()
        if tol == 0:
            return np.nan
        # Chebyshev template matches via running AND over offsets
        d0 = np.abs(x[:, None] - x[None, :]) <= tol  # (n, n) sample pairs
        def count(mm: int) -> int:
            k = n - mm + 1
            match = d0[:k, :k].copy()
            for off in range(1, mm):
                match &= d0[off : off + k, off : off + k]
            np.fill_diagonal(match, False)
            return int(match.sum())  # ordered pairs; ratio cancels the 2
        b = count(m)
        a = count(m + 1)
        if b == 0 or a == 0:
            return np.nan
        return float(-np.log(a / b))

    def _se(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        return np.array([_one(row) for row in x])

    _se.__name__ = f"sample_entropy_{m}_{r:g}"
    return FuncWrapper(_se, output_names=f"sampen_{m}_{r:g}", vectorized=True)


def permutation_entropy(order: int = 3, delay: int = 1, normalize: bool = True) -> FuncWrapper:
    """Bandt–Pompe permutation entropy (the antropy definition): Shannon
    entropy of the distribution of ordinal patterns of ``order``
    consecutive samples (``delay``-strided), ties broken by position
    (stable argsort). ``normalize=True`` divides by log(order!) → [0, 1].
    Batch-vectorized: one argsort over all windows' patterns and ONE
    flattened histogram (row-offset codes) for every window at once."""
    assert order >= 2 and delay >= 1, (order, delay)
    import math

    log_norm = np.log(float(math.factorial(order)))

    def _pe(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        nb, n = x.shape
        k = n - (order - 1) * delay
        if k < 1:
            return np.full(nb, np.nan)
        # (nb, k, order) ordinal windows
        emb = np.stack([x[:, i * delay : i * delay + k] for i in range(order)], axis=-1)
        pat = np.argsort(emb, axis=-1, kind="stable")
        # encode each pattern as an integer (mixed radix suffices)
        code = np.zeros((nb, k), dtype=np.int64)
        for i in range(order):
            code = code * order + pat[..., i]
        # one histogram for ALL rows: offset codes by row id, count runs
        n_codes = order**order
        flat = np.sort(
            (np.arange(nb, dtype=np.int64)[:, None] * n_codes + code).ravel()
        )
        boundaries = np.flatnonzero(np.diff(flat)) + 1
        starts = np.concatenate(([0], boundaries))
        ends = np.concatenate((boundaries, [flat.size]))
        counts = ends - starts
        rows = flat[starts] // n_codes
        p = counts / k
        contrib = -(p * np.log(p))
        ent = np.zeros(nb)
        np.add.at(ent, rows, contrib)
        if normalize:
            ent = ent / log_norm
        return ent

    _pe.__name__ = f"perm_entropy_{order}_{delay}"
    return FuncWrapper(
        _pe, output_names=f"perm_ent_{order}_{delay}", vectorized=True
    )


def lempel_ziv_complexity(bins: int = 10) -> FuncWrapper:
    """tsfresh ``lempel_ziv_complexity``: quantize the window into
    ``bins`` equal-width bins (numpy ``histogram`` edges over
    [min, max]), count the LZ76 dictionary phrases of the resulting
    symbol sequence, and normalize by the window length. Constant
    windows collapse to one symbol → minimal complexity. The per-window
    phrase scan is inherently sequential (O(n) with substring set
    lookups); binning is batch-vectorized."""
    assert bins >= 2, bins

    def _one(sym: np.ndarray) -> float:
        n = sym.size
        sub_strings = set()
        ind, inc = 0, 1
        while ind + inc <= n:
            sub = sym[ind : ind + inc].tobytes()
            if sub in sub_strings:
                inc += 1
            else:
                sub_strings.add(sub)
                ind += inc
                inc = 1
        return len(sub_strings) / n

    def _lz(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        nb, n = x.shape
        lo = x.min(axis=-1, keepdims=True)
        hi = x.max(axis=-1, keepdims=True)
        span = hi - lo
        with np.errstate(invalid="ignore", divide="ignore"):
            idx = np.floor((x - lo) / np.where(span > 0, span, 1.0) * bins)
        sym = np.clip(idx, 0, bins - 1).astype(np.int8)
        return np.array([_one(row) for row in sym])

    _lz.__name__ = f"lempel_ziv_{bins}"
    return FuncWrapper(_lz, output_names=f"lz_{bins}", vectorized=True)
