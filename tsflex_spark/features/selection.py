"""Feature relevance filtering — the tsfresh ``select_features`` stage
re-expressed for Spark feature frames.

Public reference semantics: tsfresh (arXiv:1610.07717, the FRESH
algorithm) scores every extracted feature against the prediction target
with a univariate hypothesis test, then keeps features that survive a
Benjamini-Hochberg FDR pass. The reference library this repo mirrors
(tsflex) interoperates with tsfresh feature sets; this module closes
the loop for feature frames produced by ``FeatureCollection.calculate``.

Spark decomposition: for numeric (and binary) targets the test
statistic is a Pearson / point-biserial correlation — a function of
(n, Σx, Σy, Σxy, Σx², Σy²) per feature, so scoring ALL features is ONE
map-side-combined aggregate over 6·n_features sums: one pass over the
data, a result bounded by the number of features, no shuffle of rows.
The t-transform, p-values, and the BH step run driver-side on that
bounded result (n_features rows, not data rows).

p-values use the exact t CDF via the regularized incomplete beta
function (continued-fraction evaluation — scipy is not assumed);
two-sided p = I_{v/(v+t²)}(v/2, 1/2).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's algorithm)."""
    MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _t_sf2(t: float, dof: float) -> float:
    """Two-sided p-value of a t statistic with ``dof`` degrees of freedom."""
    if not math.isfinite(t):
        return 0.0
    return _betainc(dof / 2.0, 0.5, dof / (dof + t * t))


def feature_relevance(
    df: DataFrame,
    target_col: str,
    feature_cols: Optional[Sequence[str]] = None,
) -> List[dict]:
    """Score every feature against ``target_col``: returns
    ``[{feature, n, r, t, p}, ...]`` sorted by p ascending.

    ``r`` is the Pearson correlation (point-biserial when the target is
    binary 0/1 — the same formula). Rows where a feature or the target
    is NULL/NaN are excluded pairwise (matching the univariate tests).
    The data sees ONE aggregate job covering all features.
    """
    if feature_cols is None:
        from pyspark.sql.types import NumericType

        feature_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, NumericType) and f.name != target_col
        ]
    feature_cols = list(feature_cols)
    y = F.col(target_col).cast("double")
    aggs = []
    for i, c in enumerate(feature_cols):
        x = F.col(c).cast("double")
        ok = x.isNotNull() & ~F.isnan(x) & y.isNotNull() & ~F.isnan(y)
        xv = F.when(ok, x)
        yv = F.when(ok, y)
        aggs += [
            F.count(xv).alias(f"__n{i}"),
            F.sum(xv).alias(f"__sx{i}"),
            F.sum(yv).alias(f"__sy{i}"),
            F.sum(xv * yv).alias(f"__sxy{i}"),
            F.sum(xv * xv).alias(f"__sxx{i}"),
            F.sum(yv * yv).alias(f"__syy{i}"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = []
    for i, c in enumerate(feature_cols):
        n = row[f"__n{i}"]
        if not n or n < 3:
            out.append({"feature": c, "n": int(n or 0), "r": None, "t": None, "p": None})
            continue
        sx, sy = row[f"__sx{i}"], row[f"__sy{i}"]
        sxy, sxx, syy = row[f"__sxy{i}"], row[f"__sxx{i}"], row[f"__syy{i}"]
        vx = sxx - sx * sx / n
        vy = syy - sy * sy / n
        cov = sxy - sx * sy / n
        # scale-aware zero test: a constant column's variance only
        # cancels to ~ulp(sxx), not to exact 0
        if vx <= 1e-12 * max(abs(sxx), 1.0) or vy <= 1e-12 * max(abs(syy), 1.0):
            out.append({"feature": c, "n": int(n), "r": None, "t": None, "p": None})
            continue
        r = cov / math.sqrt(vx * vy)
        r = max(-1.0, min(1.0, r))
        dof = n - 2
        if abs(r) >= 1.0:
            t, p = math.inf, 0.0
        else:
            t = r * math.sqrt(dof / (1.0 - r * r))
            p = _t_sf2(t, dof)
        out.append({"feature": c, "n": int(n), "r": r, "t": t, "p": p})
    return sorted(out, key=lambda d: (d["p"] is None, d["p"] if d["p"] is not None else 1.0))


def select_features(
    df: DataFrame,
    target_col: str,
    feature_cols: Optional[Sequence[str]] = None,
    fdr_level: float = 0.05,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Benjamini-Hochberg selection at ``fdr_level`` (the tsfresh
    default procedure): keep features whose p-value survives the BH
    step-up over all scored features; constant / all-NULL features are
    dropped (untestable ⇒ irrelevant, as tsfresh does).

    Returns ``df`` projected to ``keep_cols`` + the surviving features
    + the target. The BH step runs on the driver over the bounded
    relevance table.
    """
    rel = feature_relevance(df, target_col, feature_cols)
    tested = [d for d in rel if d["p"] is not None]
    m = len(tested)
    survivors: List[str] = []
    if m:
        # BH step-up: largest k with p_(k) <= k/m * q; keep the k smallest
        by_p = sorted(tested, key=lambda d: d["p"])
        kmax = 0
        for k, d in enumerate(by_p, start=1):
            if d["p"] <= fdr_level * k / m:
                kmax = k
        survivors = [d["feature"] for d in by_p[:kmax]]
    cols = list(keep_cols) + survivors + [target_col]
    return df.select(*cols)
