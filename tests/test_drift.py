"""PSI/JS drift: ~0 on same-distribution samples, large on shifts,
numpy-oracle parity for the histogram math, and NULL/constant handling."""

import math

import numpy as np
import pytest

from tsflex_spark.utils.drift import feature_drift


def _df(spark, arrays):
    cols = list(arrays)
    rows = [tuple(float(arrays[c][i]) for c in cols) for i in range(len(next(iter(arrays.values()))))]
    return spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols))


def test_no_drift_near_zero(spark):
    rng = np.random.default_rng(0)
    a = _df(spark, {"x": rng.normal(0, 1, 5000)})
    b = _df(spark, {"x": rng.normal(0, 1, 5000)})
    d = feature_drift(a, b, ["x"])[0]
    assert d["psi"] < 0.02
    assert d["js"] < 0.01


def test_shift_detected_and_ranked(spark):
    rng = np.random.default_rng(1)
    ref = _df(spark, {
        "stable": rng.normal(0, 1, 4000),
        "shifted": rng.normal(0, 1, 4000),
    })
    cur = _df(spark, {
        "stable": rng.normal(0, 1, 4000),
        "shifted": rng.normal(1.5, 1, 4000),   # big mean shift
    })
    out = feature_drift(ref, cur)
    assert out[0]["column"] == "shifted"
    assert out[0]["psi"] > 0.25
    assert out[1]["psi"] < 0.05
    # JS bounded by ln 2
    assert 0 <= out[0]["js"] <= math.log(2) + 1e-9


def test_numpy_oracle_parity(spark):
    rng = np.random.default_rng(2)
    xa = rng.normal(0, 1, 2000)
    xb = rng.normal(0.5, 1.2, 2000)
    a, b = _df(spark, {"x": xa}), _df(spark, {"x": xb})
    got = feature_drift(a, b, ["x"], bins=10, epsilon=1e-4)[0]

    # rebuild with the same definition: approx quantile edges from ref,
    # half-open (lo, hi] buckets via count of edges < x
    # percentile_approx with large accuracy ≈ exact quantiles here
    qs = np.quantile(xa, [i / 10 for i in range(1, 10)], method="lower")
    edges = sorted(set(float(v) for v in qs))
    def hist(x):
        b_ = np.array([np.sum(np.array(edges) < v) if v not in edges else np.searchsorted(edges, v, side="left") for v in x])
        # emulate: bucket = count of edges strictly below x (x > edge)
        b_ = np.array([int(np.sum(v > np.array(edges))) for v in x])
        return np.bincount(b_, minlength=len(edges) + 1)
    hr, hc = hist(xa), hist(xb)
    pr, pc = hr / hr.sum(), hc / hc.sum()
    psi = 0.0
    for p_i, q_i in zip(pr, pc):
        p_i, q_i = max(p_i, 1e-4), max(q_i, 1e-4)
        psi += (p_i - q_i) * math.log(p_i / q_i)
    # percentile_approx edge positions may differ slightly from numpy's —
    # parity is approximate at the bin level, tight at the PSI level
    assert got["psi"] == pytest.approx(psi, abs=0.03)


def test_constant_column_and_counts(spark):
    a = _df(spark, {"c": np.ones(100)})
    b = _df(spark, {"c": np.ones(100)})
    d = feature_drift(a, b, ["c"])[0]
    assert d["psi"] == pytest.approx(0.0, abs=1e-12)
    assert d["n_ref"] == 100 and d["n_cur"] == 100


def test_auto_column_selection(spark):
    rng = np.random.default_rng(3)
    a = _df(spark, {"x": rng.normal(0, 1, 500), "y": rng.normal(0, 1, 500)})
    b = _df(spark, {"x": rng.normal(0, 1, 500), "y": rng.normal(3, 1, 500)})
    out = feature_drift(a, b)
    assert {d["column"] for d in out} == {"x", "y"}


def test_categorical_drift(spark):
    from tsflex_spark.utils.drift import categorical_drift

    rng = np.random.default_rng(5)
    ref_vals = rng.choice(["a", "b", "c"], p=[0.6, 0.3, 0.1], size=3000)
    cur_same = rng.choice(["a", "b", "c"], p=[0.6, 0.3, 0.1], size=3000)
    cur_shift = rng.choice(["a", "b", "c", "d"], p=[0.1, 0.2, 0.3, 0.4], size=3000)
    mk = lambda v: spark.createDataFrame([(str(x),) for x in v], "cat string")
    same = categorical_drift(mk(ref_vals), mk(cur_same), ["cat"])[0]
    assert same["psi"] < 0.02
    shift = categorical_drift(mk(ref_vals), mk(cur_shift), ["cat"])[0]
    assert shift["psi"] > 0.25
    # unseen category 'd' lands in __other and still registers
    assert shift["n_cur"] == 3000


def test_categorical_drift_null_handling(spark):
    from tsflex_spark.utils.drift import categorical_drift

    ref = spark.createDataFrame([("a",), ("a",), ("b",)], "cat string")
    cur = spark.createDataFrame([(None,), (None,), ("a",)], "cat string")
    d = categorical_drift(ref, cur, ["cat"])[0]
    assert d["n_cur"] == 3  # NULLs counted in __other
    assert d["psi"] > 0.2


def test_pinned_edges(spark):
    """edges= pins the buckets (the production-monitoring shape): the
    result must equal a manual histogram over those exact edges, and an
    unlisted column still falls back to reference quantiles."""
    import math

    from tsflex_spark.utils.drift import feature_drift

    ref = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    cur = spark.createDataFrame([(float(i) + 50.0,) for i in range(100)], "x double")
    d = feature_drift(ref, cur, ["x"], edges={"x": [25.0, 50.0, 75.0]})[0]
    # manual replay: ref bins (26,25,25,24)/100, cur bins (0,1,25,74)/100
    eps = 1e-4
    p = [26 / 100, 25 / 100, 25 / 100, 24 / 100]
    q = [max(0 / 100, eps), max(1 / 100, eps), 25 / 100, 74 / 100]
    psi = sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))
    assert abs(d["psi"] - psi) < 1e-12
    assert d["n_ref"] == d["n_cur"] == 100
    # unlisted column -> quantile fallback still works alongside
    both = feature_drift(
        ref.withColumn("y", ref.x * 2.0),
        cur.withColumn("y", cur.x * 2.0),
        ["x", "y"],
        edges={"x": [25.0, 50.0, 75.0]},
    )
    assert {r["column"] for r in both} == {"x", "y"}
