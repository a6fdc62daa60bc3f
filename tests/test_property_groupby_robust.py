"""Hypothesis property tests for the group_by paths and make_robust.

Closes the round-6 fuzz gap: segmenter/manual/count/two-level/asof/CC/
resample were property-tested; group_by_all / group_by_consecutive and
make_robust were hand-case-only. Oracles are pandas groupby / a pure-
python islands scan / numpy — independent of the Spark implementation.

Each example batches MANY generated rows into ONE Spark job (the repo's
xxh fuzz pattern) so property coverage doesn't pay per-example session
overhead.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tsflex_spark import FeatureCollection, FeatureDescriptor


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.tuples(
            st.sampled_from(["x", "y", "z", None]),
            st.sampled_from([0.0, 1.0, 2.0, float("nan")]),
        ),
        min_size=1,
        max_size=60,
    ),
    data=st.data(),
)
def test_group_by_all_fuzz_pandas_parity(spark, keys, data):
    """group_by_all over a composite (string, float) key with NULL/NaN
    keys sprinkled in must match pandas groupby after dropping rows whose
    key contains NULL or NaN (reference drops them with a warning)."""
    n = len(keys)
    vals = data.draw(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=16),
            min_size=n,
            max_size=n,
        )
    )
    pdf = pd.DataFrame(
        {
            "ts": np.arange(n, dtype="int64"),
            "a": [k[0] for k in keys],
            "b": [k[1] for k in keys],
            "v": [float(v) for v in vals],
        }
    )
    fc = FeatureCollection(
        [
            FeatureDescriptor("sum", "v", 1, 1),
            FeatureDescriptor("count", "v", 1, 1),
        ]
    )
    out = (
        fc.calculate(spark.createDataFrame(pdf), ts_col="ts", group_by_all=["a", "b"])
        .toPandas()
        .set_index(["a", "b"])
        .sort_index()
    )
    clean = pdf[pdf["a"].notna() & pdf["b"].notna()]
    exp = clean.groupby(["a", "b"])["v"].agg(["sum", "count"]).sort_index()
    assert len(out) == len(exp)
    for k in exp.index:
        assert np.isclose(out.loc[k, "v__sum__w=manual"], exp.loc[k, "sum"]), k
        assert out.loc[k, "v__count__w=manual"] == exp.loc[k, "count"], k


def _islands_oracle(g, v):
    """Pure-python gaps-and-islands over (ts=0..n-1, g, v): consecutive
    runs of equal non-null g (null keys removed first, order kept).
    Returns [(start, g, end, sum, count)] with end = the run's LAST
    MEMBER index — the reference's reported __end (reference
    feature_collection.py:713-714; the +1 exclusive bump only feeds its
    internal slicing)."""
    rows = [(i, gi, vi) for i, (gi, vi) in enumerate(zip(g, v)) if gi is not None]
    runs = []
    for ts, gi, vi in rows:
        if runs and runs[-1]["g"] == gi:
            runs[-1]["idx"].append(ts)
            runs[-1]["vals"].append(vi)
        else:
            runs.append({"g": gi, "idx": [ts], "vals": [vi]})
    return [
        (r["idx"][0], r["g"], r["idx"][-1], float(np.sum(r["vals"])), len(r["vals"]))
        for r in runs
    ]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    g=st.lists(st.sampled_from(["p", "q", "r", None]), min_size=1, max_size=60),
    data=st.data(),
)
def test_group_by_consecutive_fuzz_islands_parity(spark, g, data):
    """group_by_consecutive (SEQUENCE domain) must reproduce a pure-
    python islands scan: run starts, last-member ends (the reference's
    reported __end), per-run sum+count — under random key runs with
    nulls breaking and re-forming islands."""
    n = len(g)
    vals = data.draw(
        st.lists(
            st.floats(min_value=-50, max_value=50, allow_nan=False, width=16),
            min_size=n,
            max_size=n,
        )
    )
    pdf = pd.DataFrame(
        {
            "ts": np.arange(n, dtype="int64"),
            "g": g,
            "v": [float(x) for x in vals],
        }
    )
    fc = FeatureCollection(
        [
            FeatureDescriptor("sum", "v", 1, 1),
            FeatureDescriptor("count", "v", 1, 1),
        ]
    )
    out = (
        fc.calculate(spark.createDataFrame(pdf), ts_col="ts", group_by_consecutive="g")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    exp = _islands_oracle(g, [float(x) for x in vals])
    assert len(out) == len(exp), (len(out), len(exp))
    for i, (start, gi, end, s, c) in enumerate(exp):
        row = out.iloc[i]
        assert row["ts"] == start and row["g"] == gi, (dict(row), start, gi)
        assert row["__start"] == start and row["__end"] == end, (dict(row), start, end)
        assert np.isclose(row["v__sum__w=manual"], s), (dict(row), s)
        assert row["v__count__w=manual"] == c, (dict(row), c)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    nan_mask=st.lists(st.booleans(), min_size=4, max_size=40),
    min_nb=st.integers(0, 12),
    passthrough=st.booleans(),
    data=st.data(),
)
def test_make_robust_fuzz_numpy_parity(spark, nan_mask, min_nb, passthrough, data):
    """make_robust under random NaN masks through the real Spark UDF
    tier on manual segments. Under the engine's wide-format data model
    NULL/NaN = NO SAMPLE (README "Native layout"), so a segment's
    effective series is its non-NaN values: the expected output is
    error_val when fewer than min_nb_samples non-NaN values fall in
    [start, end), else sum of those values — for BOTH passthrough modes
    (no NaN ever reaches the wrapped func, so the two modes must agree;
    drawing both still exercises both wrapper code paths)."""
    from tsflex_spark.features.function_wrapper import make_robust

    n = len(nan_mask)
    raw = data.draw(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=16),
            min_size=n,
            max_size=n,
        )
    )
    v = np.array([float(x) for x in raw])
    v[np.array(nan_mask)] = np.nan
    pdf = pd.DataFrame({"ts": np.arange(n, dtype="int64"), "v": v})

    # a handful of manual [start, end) segments spanning the index,
    # including an empty one when n allows
    starts = sorted({0, n // 3, max(0, n - 2)})
    ends = [min(s + max(1, n // 2), n) for s in starts]

    error_val = -777.0
    fw = make_robust(
        np.nansum if passthrough else np.sum,
        min_nb_samples=min_nb,
        error_val=error_val,
        output_names="rsum",
        passthrough_nans=passthrough,
    )
    fc = FeatureCollection([FeatureDescriptor(fw, "v", None, None)])
    out = (
        fc.calculate(
            spark.createDataFrame(pdf),
            ts_col="ts",
            segment_start_idxs=starts,
            segment_end_idxs=ends,
            window_idx="begin",
        )
        .toPandas()
        .set_index("ts")
    )
    (col,) = [c for c in out.columns if "rsum" in c]
    for s, e in zip(starts, ends):
        seg = v[s:e]
        samples = seg[~np.isnan(seg)]  # NaN = no sample in the wide format
        if len(samples) < min_nb:
            exp = error_val
        else:
            exp = float(np.sum(samples))
        got = out.loc[s, col]
        assert np.isclose(got, exp, equal_nan=True), (s, e, got, exp)
