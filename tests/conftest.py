import os

import numpy as np
import pandas as pd
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from tsflex_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark("tsflex_spark_tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def dummy_pdf():
    """Reference-shaped fixture: two regular series + one irregular, tz-naive.

    Mirrors the shape of the reference's empatica fixture
    (FIXTURES.md F1) at a small size: EDA/TMP at 4 Hz over ~10 min.
    """
    rng = np.random.default_rng(42)
    n = 2400  # 10 min at 4 Hz
    ts = pd.date_range("2024-01-01", periods=n, freq="250ms")
    return pd.DataFrame(
        {
            "ts": ts,
            "EDA": rng.normal(0.5, 0.1, n),
            "TMP": rng.normal(31.0, 0.5, n),
        }
    )


@pytest.fixture(scope="session")
def dummy_sdf(spark, dummy_pdf):
    return spark.createDataFrame(dummy_pdf)


def ref_segment_starts(start, end, window, strides, include_final=False):
    """Driver-side oracle for the reference's segment-start rules
    (strided_rolling.py:241-274): per-stride count formula + multi-stride
    dedup-union."""
    out = []
    for s in strides:
        nb = max((end - start - window) // s + 1, 0)
        if include_final and start + s * nb <= end:
            nb += 1
        out.append(start + np.arange(nb) * s)
    return np.unique(np.concatenate(out))
