"""binary_auc: exact Mann-Whitney AUC vs a numpy oracle, tie handling,
degenerate classes, and the observation-compatibility property that
motivated it (works in a session that has pending Observations, where
MLlib's RDD-based evaluator raises)."""

import numpy as np
import pandas as pd
import pytest

from tsflex_spark.utils.ml_metrics import binary_auc


def _auc_numpy(y, s):
    """Mann-Whitney with average ranks (== sklearn.roc_auc_score)."""
    y = np.asarray(y, dtype=float)
    s = np.asarray(s, dtype=float)
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), dtype=float)
    sorted_s = s[order]
    i = 0
    r = 1
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        ranks[order[i : j + 1]] = (r + (r + (j - i))) / 2.0
        r += j - i + 1
        i = j + 1
    n_pos = y.sum()
    n_neg = len(y) - n_pos
    u = ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0
    return u / (n_pos * n_neg)


def test_auc_matches_numpy_oracle(spark):
    rng = np.random.default_rng(5)
    n = 500
    y = (rng.random(n) < 0.3).astype(float)
    # informative scores with heavy TIES (2-decimal rounding)
    s = np.round(y * 0.8 + rng.normal(0, 0.7, n), 2)
    pdf = pd.DataFrame({"label": y, "score": s})
    got = binary_auc(spark.createDataFrame(pdf))
    exp = _auc_numpy(y, s)
    assert abs(got - exp) < 1e-12, (got, exp)


def test_auc_extremes_and_errors(spark):
    pdf = pd.DataFrame({"label": [0.0, 0.0, 1.0, 1.0], "score": [0.1, 0.2, 0.8, 0.9]})
    assert binary_auc(spark.createDataFrame(pdf)) == 1.0
    pdf2 = pdf.assign(score=[0.9, 0.8, 0.2, 0.1])
    assert binary_auc(spark.createDataFrame(pdf2)) == 0.0
    pdf3 = pdf.assign(score=[0.5, 0.5, 0.5, 0.5])  # all tied -> 0.5
    assert binary_auc(spark.createDataFrame(pdf3)) == 0.5
    with pytest.raises(ValueError, match="both classes"):
        binary_auc(spark.createDataFrame(pdf.assign(label=[1.0] * 4)))


def test_auc_survives_pending_observation(spark):
    """The motivating property: a session with a pending Observation
    breaks MLlib's RDD-based evaluator (Spark 4 ObservationManager
    serialization bug), but binary_auc stays on the DataFrame API."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    spark.range(5).observe(obs, F.count(F.lit(1)).alias("n"))  # never run
    rng = np.random.default_rng(11)
    y = (rng.random(200) < 0.5).astype(float)
    s = y * 0.5 + rng.random(200)
    pdf = pd.DataFrame({"label": y, "score": s})
    got = binary_auc(spark.createDataFrame(pdf))
    assert abs(got - _auc_numpy(y, s)) < 1e-12
