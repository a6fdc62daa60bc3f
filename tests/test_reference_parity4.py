"""Reference-execution parity, wave 4 — observability & serialization.

Round-8 additions per the round-7 review: the parity lane covered
calculate/processing/chunking; this wave pins the API-compat surfaces
around them:

- ``get_feature_logs`` / ``get_function_stats`` output-frame SHAPE
  parity vs the reference logger (reference
  ``tsflex/features/logger.py:30-195``): same executions logged (one
  row per (function, series, window, stride) run), same group keys in
  the stats frame, durations really measured.
- ``get_processor_logs`` parity vs the reference processing logger
  (``tsflex/processing/logger.py:70-106``).
- serialize → deserialize → recalculate round-trips through BOTH
  engines (reference ``FeatureCollection.serialize`` via the dill→
  cloudpickle shim, ``feature_collection.py:1264-1280``) produce
  bit-identical results to the pre-serialization run.
"""

import numpy as np
import pandas as pd
import pytest

from tests._reference_shim import install_reference

ref = install_reference()
pytestmark = pytest.mark.skipif(
    ref is None, reason="reference tsflex checkout not importable"
)

from tsflex_spark import (  # noqa: E402
    FeatureCollection as SparkFC,
    FeatureDescriptor as SparkFD,
    FuncWrapper as SparkFW,
)
from tests.test_reference_parity import (  # noqa: E402
    _compare,
    _ref_calc,
    _spark_calc,
    _time_series,
)


def _two_series(n=300):
    eda = _time_series(n=n, seed=3)
    eda.name = "EDA"
    tmp = _time_series(n=n, seed=4)
    tmp.name = "TMP"
    pdf = pd.DataFrame(
        {"ts": eda.index, "EDA": eda.values, "TMP": tmp.values}
    )
    return eda, tmp, pdf


def _logged_fcs():
    """One func per (series, window) so reference and engine log the
    same execution set 1:1 (the engine fuses same-config natives into
    one bucket; distinct series/window configs keep it aligned)."""
    from tsflex.features import FeatureCollection, FeatureDescriptor

    descs = [
        (np.mean, "EDA", "30s", "10s"),
        (np.std, "TMP", "60s", "10s"),
    ]
    rfc = FeatureCollection(
        [FeatureDescriptor(f, s, w, st) for f, s, w, st in descs]
    )
    sfc = SparkFC([SparkFD(f, s, w, st) for f, s, w, st in descs])
    return rfc, sfc


def test_feature_logs_shape_parity(spark, tmp_path):
    from tsflex.features.logger import get_feature_logs as ref_logs
    from tsflex_spark.utils.logging import get_feature_logs as spark_logs

    eda, tmp, pdf = _two_series()
    rfc, sfc = _logged_fcs()
    ref_log = str(tmp_path / "ref.log")
    spk_log = str(tmp_path / "spark.log")
    r = _ref_calc(rfc, [eda, tmp], logging_file_path=ref_log)
    g = _spark_calc(spark, sfc, pdf, logging_file_path=spk_log)
    _compare(r, g)  # the runs themselves agree

    rl, gl = ref_logs(ref_log), spark_logs(spk_log)
    # one logged execution per (function, series, window, stride) run
    assert len(rl) == len(gl) == 2
    # the parsed frames expose the same execution metadata fields
    for col in ("function", "series_names", "window", "stride",
                "output_names", "duration"):
        assert col in rl.columns and col in gl.columns
    # reference renders the key tuple ("(EDA,)"), engine the joined names
    ref_series = {s.strip("(),") for s in rl["series_names"]}
    assert ref_series == set(gl["series_names"]) == {"EDA", "TMP"}
    # both engines log the same output-column set
    ref_outs = {o for cell in rl["output_names"] for o in cell.split(",")}
    got_outs = {o for cell in gl["output_names"] for o in cell.split(",")}
    assert ref_outs == got_outs
    # durations are real measurements: reference parses to timedelta,
    # engine keeps float seconds — both strictly positive
    assert (rl["duration"].dt.total_seconds() > 0).all()
    assert (gl["duration"] > 0).all()


def test_function_stats_shape_parity(spark, tmp_path):
    from tsflex.features.logger import get_function_stats as ref_stats
    from tsflex_spark.utils.logging import get_function_stats as spark_stats

    eda, tmp, pdf = _two_series()
    rfc, sfc = _logged_fcs()
    ref_log = str(tmp_path / "ref.log")
    spk_log = str(tmp_path / "spark.log")
    _ref_calc(rfc, [eda, tmp], logging_file_path=ref_log)
    _spark_calc(spark, sfc, pdf, logging_file_path=spk_log)

    rs, gs = ref_stats(ref_log), spark_stats(spk_log)
    # same grouping grain: one stats row per (function, window, stride)
    assert len(rs) == len(gs) == 2
    # reference groups into a (function, window, stride) MultiIndex with
    # duration aggregates; the engine's flat frame carries the same keys
    assert list(rs.index.names) == ["function", "window", "stride"]
    assert {"function", "window", "stride"} <= set(gs.columns)
    for agg in ("sum", "mean", "std", "count"):
        assert ("duration", agg) in rs.columns
        assert agg in gs.columns
    assert (gs["count"] == 1).all()
    ref_counts = rs[("duration", "count")].to_numpy()
    assert (ref_counts == 1).all()


def test_processor_logs_parity(spark, tmp_path):
    from tsflex.processing import SeriesPipeline, SeriesProcessor
    from tsflex.processing.logger import get_processor_logs as ref_plogs
    from tsflex_spark import (
        SeriesPipeline as SparkPipe,
        SeriesProcessor as SparkProc,
    )
    from tsflex_spark.utils.logging import get_processor_logs as spark_plogs

    def shifted(s):
        # ndarray/Series-agnostic: the engine's native tier feeds arrays
        return s - 1.0

    def scaled(s):
        return s * 2.0

    eda, tmp, pdf = _two_series()
    ref_log = str(tmp_path / "refp.log")
    spk_log = str(tmp_path / "sparkp.log")
    rpipe = SeriesPipeline(
        [SeriesProcessor(shifted, "EDA"), SeriesProcessor(scaled, "TMP")]
    )
    rout = rpipe.process(
        [eda, tmp], return_df=True, logging_file_path=ref_log
    )
    spipe = SparkPipe(
        [SparkProc(shifted, "EDA"), SparkProc(scaled, "TMP")]
    )
    sout = (
        spipe.process(
            spark.createDataFrame(pdf), ts_col="ts",
            logging_file_path=spk_log,
        )
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # the processed values agree
    np.testing.assert_allclose(
        rout["EDA"].to_numpy(), sout["EDA"].to_numpy(), rtol=1e-12
    )
    np.testing.assert_allclose(
        rout["TMP"].to_numpy(), sout["TMP"].to_numpy(), rtol=1e-12
    )
    rl, gl = ref_plogs(ref_log), spark_plogs(spk_log)
    assert len(rl) == len(gl) == 2
    assert set(rl["function"]) == set(gl["function"]) == {
        "shifted", "scaled",
    }
    # both frames report a per-step duration share summing to ~100%
    assert "duration %" in rl.columns and "duration %" in gl.columns
    assert abs(float(gl["duration %"].sum()) - 100.0) < 0.1


def test_serialize_roundtrip_recalculate_parity(spark, tmp_path):
    """serialize → load → recalculate through BOTH engines: the loaded
    collection reproduces the original run exactly, and the two engines
    agree with each other — including a custom (closure-carrying)
    FuncWrapper, the case dill/cloudpickle exist for."""
    from tsflex.features import FeatureCollection, FeatureDescriptor
    from tsflex.features import FuncWrapper as RefFW

    thresh = 0.7  # captured by the closure below

    def frac_above(x: np.ndarray) -> float:
        return float((x > thresh).mean())

    eda, tmp, pdf = _two_series()
    rfc = FeatureCollection(
        [
            FeatureDescriptor(np.mean, "EDA", "30s", "10s"),
            FeatureDescriptor(
                RefFW(frac_above, output_names="frac_above"),
                "TMP", "60s", "10s",
            ),
        ]
    )
    sfc = SparkFC(
        [
            SparkFD(np.mean, "EDA", "30s", "10s"),
            SparkFD(
                SparkFW(frac_above, output_names="frac_above"),
                "TMP", "60s", "10s",
            ),
        ]
    )
    r_direct = _ref_calc(rfc, [eda, tmp])
    g_direct = _spark_calc(spark, sfc, pdf)
    _compare(r_direct, g_direct)

    rpath = str(tmp_path / "ref_fc.pkl")
    rfc.serialize(rpath)
    import dill  # the shim maps this to cloudpickle in-container

    with open(rpath, "rb") as fh:
        rfc2 = dill.load(fh)
    r_again = _ref_calc(rfc2, [eda, tmp])
    pd.testing.assert_frame_equal(r_direct, r_again)

    spath = str(tmp_path / "spark_fc.pkl")
    sfc.serialize(spath)
    sfc2 = SparkFC.deserialize(spath)
    g_again = _spark_calc(spark, sfc2, pdf)
    pd.testing.assert_frame_equal(g_direct, g_again)
    _compare(r_again, g_again)


def test_sparsity_warning_parity(spark):
    """Both engines warn (RuntimeWarning mentioning gaps) on the same
    gapped config and stay silent on the same regular config — the
    reference's per-container min!=max window-sample check
    (strided_rolling.py:231-239) vs the engine's Observation watcher."""
    import warnings as W

    from tsflex.features import FeatureCollection, FeatureDescriptor

    def run_ref(series):
        fc = FeatureCollection([FeatureDescriptor(np.mean, "EDA", "30s", "10s")])
        with W.catch_warnings(record=True) as rec:
            W.simplefilter("always")
            fc.calculate([series], return_df=True, n_jobs=1)
        return [w for w in rec if "gaps" in str(w.message).lower()]

    def run_spark(pdf):
        fc = SparkFC([SparkFD(np.mean, "EDA", "30s", "10s")])
        with W.catch_warnings(record=True) as rec:
            W.simplefilter("always")
            # collect so the Observation watcher fires before we read rec
            fc.calculate(spark.createDataFrame(pdf), ts_col="ts").collect()
        import time

        time.sleep(0.5)  # watcher thread delivers asynchronously
        return [w for w in rec if "gaps" in str(w.message).lower()]

    # regular 1 Hz series: neither engine warns
    s = _time_series(n=200, seed=9)
    s.name = "EDA"
    pdf = pd.DataFrame({"ts": s.index, "EDA": s.values})
    assert run_ref(s) == []
    assert run_spark(pdf) == []

    # gapped series (a hole bigger than the window): both engines warn
    gap = s.drop(s.index[60:120])
    gap.name = "EDA"
    gpdf = pd.DataFrame({"ts": gap.index, "EDA": gap.values})
    assert len(run_ref(gap)) >= 1
    assert len(run_spark(gpdf)) >= 1


def test_series_names_stats_parity(spark, tmp_path):
    """get_series_names_stats: same per-series grouping grain as the
    reference's series-names stats frame (logger.py:168-195)."""
    from tsflex.features.logger import get_series_names_stats as ref_sstats
    from tsflex_spark.utils.logging import (
        get_series_names_stats as spark_sstats,
    )

    eda, tmp, pdf = _two_series()
    rfc, sfc = _logged_fcs()
    ref_log = str(tmp_path / "ref.log")
    spk_log = str(tmp_path / "spark.log")
    _ref_calc(rfc, [eda, tmp], logging_file_path=ref_log)
    _spark_calc(spark, sfc, pdf, logging_file_path=spk_log)
    rs, gs = ref_sstats(ref_log), spark_sstats(spk_log)
    # one row per distinct series-name set, both engines
    assert len(rs) == len(gs) == 2
