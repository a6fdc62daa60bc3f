"""Distributed resampling with linear interpolation.

The reference's processing docs/tests use pandas ``resample`` /
``interpolate`` as the canonical SeriesProcessor functions (reference
tests/test_processing_series_pipeline.py:21-115). The pandas-tier
``SeriesProcessor(input_type="pandas")`` runs those verbatim per series;
this module is the *Spark-first* equivalent for large series: the grid
is a ``sequence``/``explode`` (no driver loop). Keyed input takes the
FUSED path — both interpolation neighbours computed on ONE hash
exchange (ascending window for the backward carry, a locally re-sorted
descending window for the forward carry). Unkeyed input falls back to
two as-of joins (union-and-carry; range-partitioned internally — see
tsflex_spark/relational.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsflex_spark.relational import asof_join
from tsflex_spark.utils.data import DataType, determine_type
from tsflex_spark.utils.time_args import to_numeric_units, ts_micros


def resample_interpolate(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    period: Union[str, pd.Timedelta, int, float],
    key_cols: Sequence[str] = (),
    origin: Optional[Union[str, pd.Timestamp, int, float]] = None,
) -> DataFrame:
    """Resample ``value_col`` onto a regular ``period`` grid with linear
    interpolation between the surrounding samples.

    The grid spans ``[ceil(min_ts), max_ts]`` per key (aligned to
    ``origin`` when given, else to the key's first sample). Grid points
    that coincide with a sample return the sample value exactly; points
    between samples interpolate linearly; no extrapolation (a grid point
    before the first / after the last sample would be null — impossible
    with this grid span). Output: ``(keys..., ts, value_col)``.
    """
    key_cols = list(key_cols)
    domain = determine_type(df, ts_col)
    is_time = domain == DataType.TIME
    step = int(to_numeric_units(period, is_time))

    tsn = ts_micros(ts_col) if is_time else F.col(ts_col).cast("double")
    data = df.select(*key_cols, tsn.alias("__tsn"), F.col(value_col).cast("double").alias("__v"))
    if origin is not None:
        org = (
            int(pd.Timestamp(origin).value // 1_000) if is_time else float(origin)
        )
        org_expr = F.lit(org)
    else:
        org_expr = None

    b = data.groupBy(*key_cols).agg(F.min("__tsn").alias("__t0"), F.max("__tsn").alias("__t1"))
    if org_expr is not None:
        # first grid point >= t0 on the origin-aligned lattice
        start = org_expr + F.ceil((F.col("__t0") - org_expr) / step).cast("long") * step
    else:
        start = F.col("__t0")
    # an origin-aligned start can land BEYOND the key's last sample (all
    # of the key's span between two lattice points) — that key's grid is
    # legitimately empty, but Spark's sequence() throws on start > stop,
    # so guard it (found by the hypothesis fuzz: period 3, origin 0,
    # span [1, 2] -> start 3 > t1 2)
    s_col = start.cast("long")
    e_col = F.col("__t1").cast("long")
    grid = b.select(
        *key_cols,
        F.explode(
            F.when(s_col <= e_col, F.sequence(s_col, e_col, F.lit(step))).otherwise(
                F.array().cast("array<long>")
            )
        ).alias("__g"),
    )

    if key_cols:
        # FUSED keyed path — both neighbours on ONE shuffle. Union grid
        # (tag 1, null value) with data (tag 0), hash-exchange by key
        # once; the backward carry is a last(ignorenulls) over the
        # ascending (tsn, tag) order — data rows at the grid instant sort
        # first, so a grid point ON a sample is inclusive — and the
        # forward carry is the same trick over (tsn DESC, tag ASC):
        # Catalyst satisfies the second window's distribution with the
        # existing exchange and inserts only a local re-sort. Measured at
        # sf0.1: gate shuffle write 38.3 -> 27.2 MB, wall 2.6 -> 1.5 s
        # (the two-asof form paid the union+window shuffle twice; the
        # remainder is the gate's own final ORDER BY).
        from pyspark.sql import Window

        g_rows = grid.select(
            *key_cols,
            F.col("__g").cast("double").alias("__t"),
            F.lit(1).alias("__tag"),
            F.lit(None).cast("double").alias("__v"),
        )
        d_rows = data.select(
            *key_cols,
            F.col("__tsn").cast("double").alias("__t"),
            F.lit(0).alias("__tag"),
            F.col("__v"),
        )
        u = d_rows.unionByName(g_rows)
        w_b = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col("__t").asc(), F.col("__tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_f = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col("__t").desc(), F.col("__tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        dv = F.when(F.col("__tag") == 0, F.col("__v"))
        dt = F.when(F.col("__tag") == 0, F.col("__t"))
        both = (
            u.withColumn("__vp", F.last(dv, ignorenulls=True).over(w_b))
            .withColumn("__tp", F.last(dt, ignorenulls=True).over(w_b))
            .withColumn("__vn", F.last(dv, ignorenulls=True).over(w_f))
            .withColumn("__tn", F.last(dt, ignorenulls=True).over(w_f))
            .where(F.col("__tag") == 1)
        )
        num = F.col("__t") - F.col("__tp")
        den = F.col("__tn") - F.col("__tp")
        interp = F.when(den == 0, F.col("__vp")).otherwise(
            F.col("__vp") + (F.col("__vn") - F.col("__vp")) * num / den
        )
        out_ts = (
            F.timestamp_micros(F.col("__t").cast("long")) if is_time else F.col("__t")
        )
        return both.select(
            *key_cols, out_ts.alias(ts_col), interp.alias(value_col)
        )

    # UNKEYED path: one logical series — the as-of joins range-partition
    # internally (utils.distributed two-pass), never one task.
    if is_time:
        g_ts = F.timestamp_micros(F.col("__g"))
        d_ts = F.timestamp_micros(F.col("__tsn").cast("long"))
        left = grid.select(*key_cols, g_ts.alias("__gts"))
        right = data.select(*key_cols, d_ts.alias("__gts"), F.col("__v"))
        on = "__gts"
    else:
        left = grid.select(*key_cols, F.col("__g").cast("double").alias("__gts"))
        right = data.select(*key_cols, F.col("__tsn").alias("__gts"), F.col("__v"))
        on = "__gts"

    prev = asof_join(
        left, right, on=on, by=key_cols, value_cols=["__v"], direction="backward", suffix="_p"
    ).withColumnRenamed("__v", "__vp").withColumnRenamed(f"{on}_p", "__tp")
    both = asof_join(
        prev, right, on=on, by=key_cols, value_cols=["__v"], direction="forward", suffix="_n"
    ).withColumnRenamed("__v", "__vn").withColumnRenamed(f"{on}_n", "__tn")

    if is_time:
        num = ts_micros(on) - ts_micros("__tp")
        den = ts_micros("__tn") - ts_micros("__tp")
    else:
        num = F.col(on) - F.col("__tp")
        den = F.col("__tn") - F.col("__tp")
    interp = F.when(den == 0, F.col("__vp")).otherwise(
        F.col("__vp") + (F.col("__vn") - F.col("__vp")) * num / den
    )
    out = both.select(
        *key_cols,
        F.col(on).alias(ts_col),
        interp.alias(value_col),
    )
    return out
