"""Unit tests for utils/distributed.py — the two-pass global-order
primitives are load-bearing (count-based windows, consecutive runs, gap
chunking all sit on them), so they get direct ground-truth checks against
pandas on adversarial shapes: many partitions, duplicate order values,
empty inputs, and single rows.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsflex_spark.utils.distributed import (
    with_global_islands,
    with_global_row_number,
    with_global_shift,
)


def _mk(spark, n, seed=0, dups=False):
    rng = np.random.default_rng(seed)
    order = rng.permutation(n) * (1 if not dups else 1)
    if dups:
        order = order // 3  # heavy duplicate order keys
    pdf = pd.DataFrame({"o": order.astype("int64"), "x": rng.normal(size=n)})
    # many input partitions so range repartition really redistributes
    return pdf, spark.createDataFrame(pdf).repartition(13)


def test_global_row_number_matches_rank(spark):
    pdf, df = _mk(spark, 5000, seed=1)
    out = with_global_row_number(df, "o", "rn", zero_based=True).toPandas()
    out = out.sort_values("o").reset_index(drop=True)
    assert out["rn"].tolist() == list(range(5000))


def test_global_shift_lag_lead_match_pandas(spark):
    pdf, df = _mk(spark, 3000, seed=2)
    ref = pdf.sort_values("o").reset_index(drop=True)
    lag = with_global_shift(df, "o", "o", "prev", offset=-1).toPandas()
    lag = lag.sort_values("o").reset_index(drop=True)
    expect = ref["o"].shift(1)
    assert ((lag["prev"] == expect) | (lag["prev"].isna() & expect.isna())).all()
    lead = with_global_shift(df, "o", "o", "nxt", offset=1).toPandas()
    lead = lead.sort_values("o").reset_index(drop=True)
    expect = ref["o"].shift(-1)
    assert ((lead["nxt"] == expect) | (lead["nxt"].isna() & expect.isna())).all()


def test_global_islands_match_pandas(spark):
    rng = np.random.default_rng(3)
    # ts with occasional big gaps
    steps = rng.choice([1, 1, 1, 100], size=4000)
    ts = np.cumsum(steps).astype("int64")
    pdf = pd.DataFrame({"o": ts})
    df = spark.createDataFrame(pdf).repartition(17)
    out = with_global_islands(
        df, "o", "o", lambda prev: prev.isNull() | ((F.col("o") - prev) > 10), "isl"
    ).toPandas().sort_values("o").reset_index(drop=True)
    ref = pdf.sort_values("o").reset_index(drop=True)
    expect = ((ref["o"] - ref["o"].shift(1)).fillna(1e9) > 10).cumsum()
    assert out["isl"].tolist() == expect.tolist()


def test_helpers_on_tiny_and_empty(spark):
    one = spark.createDataFrame(pd.DataFrame({"o": [7]}))
    assert with_global_row_number(one, "o", "rn").first()["rn"] == 1
    assert with_global_shift(one, "o", "o", "p").first()["p"] is None
    empty = spark.createDataFrame([], "o long")
    assert with_global_row_number(empty, "o", "rn").count() == 0


def test_keyed_paths_equal_plain_windows(spark):
    rng = np.random.default_rng(4)
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 2000),
            "o": rng.permutation(2000).astype("int64"),
        }
    )
    df = spark.createDataFrame(pdf).repartition(7)
    out = with_global_row_number(df, "o", "rn", key_cols=["k"], zero_based=True).toPandas()
    ref = pdf.sort_values(["k", "o"]).groupby("k").cumcount()
    got = out.sort_values(["k", "o"]).reset_index(drop=True)["rn"]
    assert got.tolist() == ref.tolist()


def test_global_ewma_matches_pandas(spark):
    """Distributed EWMA (range-partitioned scans + geometric prefix
    stitch) must match pandas ewm(adjust=True).mean() to float precision
    across partition boundaries and alphas."""
    import numpy as np
    import pandas as pd

    from tsflex_spark.utils.distributed import with_global_ewma

    rng = np.random.default_rng(3)
    n = 3000
    pdf = pd.DataFrame({"i": np.arange(n), "v": rng.normal(size=n)})
    sdf = spark.createDataFrame(pdf).repartition(7)
    for alpha in (0.9, 0.3, 0.05, 1.0):
        out = with_global_ewma(sdf, "v", alpha, ["i"]).orderBy("i").toPandas()
        exp = pdf["v"].ewm(alpha=alpha, adjust=True).mean().to_numpy()
        assert np.max(np.abs(out["v_ewma"].to_numpy() - exp)) < 1e-12


def test_global_ewma_plan_range_partitions(spark):
    """The EWMA plan must range-partition + broadcast tiny carries —
    never a single-partition window over the data."""
    import contextlib, io

    import numpy as np
    import pandas as pd

    from tsflex_spark.utils.distributed import with_global_ewma

    pdf = pd.DataFrame({"i": np.arange(100), "v": np.ones(100)})
    out = with_global_ewma(spark.createDataFrame(pdf), "v", 0.5, ["i"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "rangepartitioning" in plan.lower()
    assert "BroadcastExchange" in plan
