"""Canonical smoothing processing funcs (SURVEY §2.8 family — the
reference ships resampling/interpolation as "canonical user functions";
EWMA is the same category for Spark users, with a distributed plan).

Keyed input distributes per key (one Arrow group per key — pandas ewm
inside, exact semantics); unkeyed input routes through
``utils.distributed.with_global_ewma`` (range-partitioned linear-
recurrence scan + geometric prefix stitch) so ONE logical series never
collapses to one partition.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsflex_spark.utils.distributed import with_global_ewma


def ewma(
    df: DataFrame,
    value_col: str,
    alpha: float,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    out_col: Optional[str] = None,
) -> DataFrame:
    """Exponentially-weighted moving average in time order
    (``pandas ewm(alpha, adjust=True).mean()`` semantics).

    With ``key_cols``: per-key ``applyInPandas`` — keys distribute across
    executors, each key's series is computed exactly by pandas. Without
    keys: the distributed global scan (``with_global_ewma``).
    """
    out_col = out_col or f"{value_col}_ewma"
    key_cols = list(key_cols)
    if not key_cols:
        return with_global_ewma(df, value_col, alpha, [ts_col], out_col=out_col)

    a = float(alpha)
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {out_col} double"

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        pdf[out_col] = pdf[value_col].ewm(alpha=a, adjust=True).mean()
        return pdf

    return df.groupBy(*key_cols).applyInPandas(per_key, schema)
