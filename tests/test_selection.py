"""Feature relevance / BH selection: correlation + p-value parity with
a numpy/math reference, NULL handling, BH behavior, and the one-job
plan shape."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsflex_spark.features.selection import (
    _betainc,
    _t_sf2,
    feature_relevance,
    select_features,
)


def _frame(spark, n=400, seed=1):
    rng = np.random.default_rng(seed)
    y = rng.normal(0, 1, n)
    strong = 2.0 * y + rng.normal(0, 0.1, n)       # |r| ~ 1
    weak = 0.3 * y + rng.normal(0, 1.0, n)         # moderate
    noise = rng.normal(0, 1, n)                    # ~0
    const = np.full(n, 3.14)                       # untestable
    pdf = {
        "y": y, "strong": strong, "weak": weak, "noise": noise, "const": const,
    }
    rows = [tuple(float(v) for v in t) for t in zip(*pdf.values())]
    return (
        spark.createDataFrame(rows, "y double, strong double, weak double, noise double, const double"),
        pdf,
    )


def _ref_pearson(x, y):
    x, y = np.asarray(x), np.asarray(y)
    r = float(np.corrcoef(x, y)[0, 1])
    n = len(x)
    t = r * math.sqrt((n - 2) / (1 - r * r))
    return r, t


def test_betainc_known_values():
    # I_x(1,1) = x (uniform); I_x(0.5,0.5) = 2/pi * arcsin(sqrt(x))
    for x in (0.1, 0.5, 0.9):
        assert _betainc(1.0, 1.0, x) == pytest.approx(x, abs=1e-12)
        assert _betainc(0.5, 0.5, x) == pytest.approx(
            2 / math.pi * math.asin(math.sqrt(x)), abs=1e-10
        )


def test_t_sf2_reference_values():
    # t=0 → p=1; large dof ≈ normal: t=1.96, dof=1e6 → ~0.05
    assert _t_sf2(0.0, 10) == pytest.approx(1.0)
    assert _t_sf2(1.96, 1_000_000) == pytest.approx(0.05, abs=2e-3)
    # published t-table value: dof=10, t=2.228 → two-sided p = 0.05
    assert _t_sf2(2.228, 10) == pytest.approx(0.05, abs=1e-3)


def test_feature_relevance_matches_numpy(spark):
    sdf, pdf = _frame(spark)
    rel = {d["feature"]: d for d in feature_relevance(sdf, "y")}
    for c in ("strong", "weak", "noise"):
        r_ref, t_ref = _ref_pearson(pdf[c], pdf["y"])
        assert rel[c]["r"] == pytest.approx(r_ref, abs=1e-9)
        assert rel[c]["t"] == pytest.approx(t_ref, rel=1e-6)
    assert rel["const"]["p"] is None  # zero variance → untestable
    # ordering: strong < weak < noise in p
    ps = [rel[c]["p"] for c in ("strong", "weak")]
    assert ps[0] < ps[1] < rel["noise"]["p"]


def test_null_rows_excluded_pairwise(spark):
    sdf, pdf = _frame(spark, n=100)
    with_nulls = sdf.withColumn(
        "strong", F.when(F.rand(7) < 0.2, None).otherwise(F.col("strong"))
    )
    rel = {d["feature"]: d for d in feature_relevance(with_nulls, "y")}
    assert rel["strong"]["n"] < 100
    assert rel["noise"]["n"] == 100
    assert abs(rel["strong"]["r"]) > 0.9  # still detected on the subset


def test_select_features_bh(spark):
    sdf, _ = _frame(spark)
    out = select_features(sdf, "y", fdr_level=0.05)
    cols = set(out.columns)
    assert "strong" in cols and "weak" in cols
    assert "noise" not in cols and "const" not in cols
    assert "y" in cols
    # keep_cols pass through
    sdf2 = sdf.withColumn("id", F.monotonically_increasing_id())
    out2 = select_features(sdf2, "y", feature_cols=["strong", "noise"], keep_cols=["id"])
    assert out2.columns[0] == "id"


def test_single_job_plan(spark):
    """All features score in ONE aggregate — no per-feature jobs."""
    sdf, _ = _frame(spark)
    n_before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    feature_relevance(sdf, "y")
    # cheap proxy: the call triggers exactly one collect; assert via
    # explain that a single Aggregate covers all sums
    agg_plan = sdf.agg(
        F.count("strong"), F.sum("strong"), F.sum("noise")
    )._jdf.queryExecution().optimizedPlan().toString()
    assert agg_plan.count("Aggregate") == 1
