"""Optional-dependency integration tests: when the REAL third-party
feature libraries are importable, run the reference-shaped wrapper tests
against them (reference tests/test_features_integration.py:28-480);
skip cleanly otherwise (none of the libraries ships in the build
container — the fake-backed shape tests in test_observability.py always
run)."""

import numpy as np
import pandas as pd
import pytest

from tsflex_spark import FeatureCollection, FeatureDescriptor

# opt-in lane: `pytest -m real_libs` / tools/integration_lane.sh; the
# importorskips keep the default run green without the libraries
pytestmark = pytest.mark.real_libs


def _series_df(spark, n=200, freq="1s"):
    rng = np.random.default_rng(42)
    ts = pd.date_range("2024-01-01", periods=n, freq=freq)
    pdf = pd.DataFrame({"ts": ts, "v": rng.normal(size=n)})
    return spark.createDataFrame(pdf), pdf


def test_seglearn_base_features(spark):
    seglearn = pytest.importorskip("seglearn")
    from tsflex_spark.features.integrations import seglearn_feature_dict_wrapper

    feats = seglearn.feature_functions.base_features()
    wrappers = seglearn_feature_dict_wrapper(feats)
    sdf, pdf = _series_df(spark)
    fc = FeatureCollection(
        [FeatureDescriptor(w, "v", "100s", "100s") for w in wrappers]
    )
    out = fc.calculate(sdf, ts_col="ts").toPandas().sort_values("ts")
    assert len(out) == 2
    # parity with the library called directly on the first window
    win = pdf["v"].to_numpy()[:100].reshape(1, -1)
    for name, f in feats.items():
        col = f"v__{name}__w=100s"
        if col in out.columns:
            exp = np.asarray(f(win)).flatten()[0]
            assert out[col].iloc[0] == pytest.approx(exp, rel=1e-9)


def test_tsfresh_simple_and_combiner(spark):
    pytest.importorskip("tsfresh")
    from tsfresh.feature_extraction.feature_calculators import (
        abs_energy,
        index_mass_quantile,
    )

    from tsflex_spark.features.integrations import (
        tsfresh_combiner_feature_wrapper,
        tsfresh_simple_feature_wrapper,
    )

    sdf, pdf = _series_df(spark)
    fc = FeatureCollection(
        [
            FeatureDescriptor(
                tsfresh_simple_feature_wrapper(abs_energy), "v", "100s", "100s"
            ),
            FeatureDescriptor(
                tsfresh_combiner_feature_wrapper(
                    index_mass_quantile, param=[{"q": 0.25}, {"q": 0.75}]
                ),
                "v", "100s", "100s",
            ),
        ]
    )
    out = fc.calculate(sdf, ts_col="ts").toPandas().sort_values("ts")
    assert len(out) == 2
    win = pdf["v"].to_numpy()[:100]
    assert out["v__abs_energy__w=100s"].iloc[0] == pytest.approx(
        abs_energy(win), rel=1e-9
    )


def test_tsfel_statistical_domain(spark):
    tsfel = pytest.importorskip("tsfel")
    from tsflex_spark.features.integrations import tsfel_feature_dict_wrapper

    cfg = tsfel.get_features_by_domain("statistical")
    wrappers = tsfel_feature_dict_wrapper(cfg)
    sdf, _pdf = _series_df(spark)
    fc = FeatureCollection(
        [FeatureDescriptor(w, "v", "100s", "100s") for w in wrappers[:8]]
    )
    out = fc.calculate(sdf, ts_col="ts").toPandas()
    assert len(out) == 2
    feat_cols = [c for c in out.columns if c.startswith("v__")]
    assert feat_cols and out[feat_cols].notna().all().all()


def test_pycatch22_all(spark):
    pycatch22 = pytest.importorskip("pycatch22")
    from tsflex_spark.features.integrations import catch22_wrapper

    fw = catch22_wrapper(pycatch22.catch22_all)
    assert len(fw.output_names) == 22
    sdf, pdf = _series_df(spark)
    fc = FeatureCollection([FeatureDescriptor(fw, "v", "100s", "100s")])
    out = fc.calculate(sdf, ts_col="ts").toPandas().sort_values("ts")
    assert len(out) == 2
    exp = pycatch22.catch22_all(pdf["v"].to_numpy()[:100])
    for name, val in zip(exp["names"], exp["values"]):
        assert out[f"v__{name}__w=100s"].iloc[0] == pytest.approx(
            val, rel=1e-6, nan_ok=True
        )
