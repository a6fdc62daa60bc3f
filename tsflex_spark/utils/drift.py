"""Distribution drift between two DataFrames (training vs serving,
yesterday vs today) — the PSI monitor every feature pipeline runs.

Population Stability Index per column: bin the REFERENCE frame into
``bins`` quantile buckets, histogram both frames over those same
edges, then ``PSI = Σ (p_i - q_i)·ln(p_i/q_i)`` (industry reading:
< 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action). Jensen-Shannon
divergence is emitted alongside (bounded [0, ln 2], symmetric — the
better-behaved number for alerting thresholds).

Spark decomposition: edges come from one ``percentile_approx`` over
the reference (a single aggregate row); each frame's histogram is ONE
aggregate of ``bins`` conditional counts per column (map-side
combined — the job result is bins × columns scalars, rows never
shuffle). Two jobs total for any number of columns.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edges(
    ref: DataFrame, cols: Sequence[str], bins: int
) -> Dict[str, List[float]]:
    qs = [i / bins for i in range(1, bins)]
    row = ref.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), qs, 10_000).alias(c)
            for c in cols
        ]
    ).collect()[0]
    out = {}
    for c in cols:
        # dedup degenerate edges (constant-ish columns)
        seen, e = set(), []
        for v in row[c] or []:
            if v is not None and v not in seen:
                seen.add(v)
                e.append(float(v))
        out[c] = e
    return out


def _hist(
    df: DataFrame, cols: Sequence[str], edges: Dict[str, List[float]]
) -> Dict[str, List[int]]:
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        e = edges[c]
        nb = len(e) + 1
        # bucket index: count of edges <= x (half-open (e_{i-1}, e_i])
        b = sum((F.when(x > F.lit(v), 1).otherwise(0)) for v in e) if e else F.lit(0)
        for j in range(nb):
            aggs.append(
                F.sum(
                    F.when(x.isNotNull() & ~F.isnan(x) & (b == j), 1).otherwise(0)
                ).alias(f"__{c}__{j}")
            )
    row = df.agg(*aggs).collect()[0]
    return {c: [int(row[f"__{c}__{j}"] or 0) for j in range(len(edges[c]) + 1)] for c in cols}


def feature_drift(
    reference: DataFrame,
    current: DataFrame,
    cols: Optional[Sequence[str]] = None,
    bins: int = 10,
    epsilon: float = 1e-4,
    edges: Optional[Dict[str, List[float]]] = None,
) -> List[dict]:
    """Per-column drift between ``reference`` and ``current``:
    ``[{column, psi, js, n_ref, n_cur}, ...]`` sorted by PSI descending.

    Bins are reference-frame quantiles (equal mass on the reference, so
    PSI is scale-free); empty bins are smoothed with ``epsilon`` mass
    before the log-ratios, the standard PSI convention.

    Pass ``edges`` ({column: sorted bin edges}) to pin the buckets
    instead of deriving them — the production-monitoring shape: edges
    are computed ONCE from the training reference and reused verbatim
    across every serving window, so day-over-day PSI moves only when
    the DATA moves, never because the approximate quantile sketch
    re-drew the bins (``bins`` is then ignored for those columns).
    """
    if cols is None:
        from pyspark.sql.types import NumericType

        ref_numeric = {
            f.name for f in reference.schema.fields
            if isinstance(f.dataType, NumericType)
        }
        cols = [
            f.name for f in current.schema.fields
            if isinstance(f.dataType, NumericType) and f.name in ref_numeric
        ]
    cols = list(cols)
    if not cols:
        return []
    if edges is None:
        edges = _edges(reference, cols, bins)
    else:
        missing = [c for c in cols if c not in edges]
        edges = {c: [float(v) for v in e] for c, e in edges.items() if c in cols}
        if missing:
            edges.update(_edges(reference, missing, bins))
    h_ref = _hist(reference, cols, edges)
    h_cur = _hist(current, cols, edges)
    out = []
    for c in cols:
        nr, nc = sum(h_ref[c]), sum(h_cur[c])
        if nr == 0 or nc == 0:
            out.append({"column": c, "psi": None, "js": None, "n_ref": nr, "n_cur": nc})
            continue
        psi = 0.0
        js = 0.0
        for r, q in zip(h_ref[c], h_cur[c]):
            p_i = max(r / nr, epsilon)
            q_i = max(q / nc, epsilon)
            psi += (p_i - q_i) * math.log(p_i / q_i)
            m = 0.5 * (p_i + q_i)
            js += 0.5 * p_i * math.log(p_i / m) + 0.5 * q_i * math.log(q_i / m)
        out.append(
            {"column": c, "psi": psi, "js": js, "n_ref": int(nr), "n_cur": int(nc)}
        )
    return sorted(out, key=lambda d: (d["psi"] is None, -(d["psi"] or 0.0)))


def categorical_drift(
    reference: DataFrame,
    current: DataFrame,
    cols: Sequence[str],
    top_k: int = 20,
    epsilon: float = 1e-4,
) -> List[dict]:
    """PSI/JS over CATEGORY frequencies: the reference's ``top_k`` most
    frequent values per column are the bins, everything else (and NULL)
    folds into ``__other`` — the standard categorical PSI construction
    (stable bin set, bounded aggregate width).

    Jobs: one small groupBy per column to discover the reference's
    top-k (result is k rows), then ONE conditional-count aggregate per
    frame shared across all columns.
    """
    cols = list(cols)
    cats: Dict[str, List] = {}
    for c in cols:
        top = (
            reference.where(F.col(c).isNotNull())
            .groupBy(c)
            .agg(F.count(F.lit(1)).alias("__n"))
            .orderBy(F.col("__n").desc(), F.col(c))
            .limit(int(top_k))
            .collect()
        )
        cats[c] = [r[c] for r in top]

    def hist(df: DataFrame) -> Dict[str, List[int]]:
        aggs = []
        for c in cols:
            x = F.col(c)
            for j, v in enumerate(cats[c]):
                aggs.append(
                    F.sum(F.when(x == F.lit(v), 1).otherwise(0)).alias(f"__{c}__{j}")
                )
            other = F.when(
                x.isNull() | ~x.isin(*cats[c]) if cats[c] else F.lit(True), 1
            ).otherwise(0)
            aggs.append(F.sum(other).alias(f"__{c}__other"))
        row = df.agg(*aggs).collect()[0]
        return {
            c: [int(row[f"__{c}__{j}"] or 0) for j in range(len(cats[c]))]
            + [int(row[f"__{c}__other"] or 0)]
            for c in cols
        }

    h_ref, h_cur = hist(reference), hist(current)
    out = []
    for c in cols:
        nr, nc = sum(h_ref[c]), sum(h_cur[c])
        if nr == 0 or nc == 0:
            out.append({"column": c, "psi": None, "js": None, "n_ref": nr, "n_cur": nc})
            continue
        psi = js = 0.0
        for r, q in zip(h_ref[c], h_cur[c]):
            p_i = max(r / nr, epsilon)
            q_i = max(q / nc, epsilon)
            psi += (p_i - q_i) * math.log(p_i / q_i)
            m = 0.5 * (p_i + q_i)
            js += 0.5 * p_i * math.log(p_i / m) + 0.5 * q_i * math.log(q_i / m)
        out.append(
            {"column": c, "psi": psi, "js": js, "n_ref": int(nr), "n_cur": int(nc)}
        )
    return sorted(out, key=lambda d: (d["psi"] is None, -(d["psi"] or 0.0)))
