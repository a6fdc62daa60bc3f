"""As-of (nearest-predecessor) join — a relational op the reference lacks
(SURVEY §2.3: "As-of join: absent in reference") but that time-series
pipelines need constantly (sensor enrichment, trade/quote alignment).

Spark-first strategy: the classic *union-and-carry* plan instead of a
non-equi range join. Tag right rows 0 and left rows 1, union them, and
run one per-key window pass where ``last(right_value, ignorenulls)``
carries the most recent right-hand value forward onto each left row.
One shuffle (the window's hash partition on ``by``), no O(n·m)
BroadcastNestedLoop, skew-bounded by the key with AQE. Equal timestamps:
the right row sorts before the left row (tag order), so a right update
AT t is visible to a left row AT t — same as DuckDB/pandas
``ASOF JOIN ... ON r.ts <= l.ts`` inclusive semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tsflex_spark.utils.time_args import to_numeric_units, ts_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: Sequence[str] = (),
    value_cols: Optional[Sequence[str]] = None,
    direction: str = "backward",
    tolerance: Optional[Union[str, pd.Timedelta, int, float]] = None,
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the right row's ``value_cols`` from the
    nearest right timestamp at-or-before (``backward``) / at-or-after
    (``forward``) the left timestamp, matching within ``by`` groups.

    ``tolerance`` (duration string / Timedelta for TIME, number for
    SEQUENCE) nulls matches further than the given distance. Left rows
    with no match keep NULLs (left-join semantics). Without ``by`` the
    window is a global order — pass keys for distributed execution.
    """
    assert direction in ("backward", "forward")
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in value_cols}

    l_tag = left.withColumn("__tag", F.lit(1))
    for c in value_cols:
        l_tag = l_tag.withColumn(f"__rv_{c}", F.lit(None).cast(right.schema[c].dataType))
    l_tag = l_tag.withColumn("__rts", F.lit(None).cast(right.schema[on].dataType))

    r_tag = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
        F.col(on).alias("__rts"),
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l_tag.unionByName(r_tag)

    carry_cols = ["__rts"] + [f"__rv_{c}" for c in value_cols]
    if by:
        ts_ord = F.col(on).asc() if direction == "backward" else F.col(on).desc()
        w = W.partitionBy(*by).orderBy(ts_ord, F.col("__tag").asc())
        frame = w.rowsBetween(W.unboundedPreceding, 0)
        pick = lambda c: F.last(c, ignorenulls=True).over(frame)  # noqa: E731
        carried = u.select(
            *[F.col(c) for c in left.columns],
            F.col("__tag"),
            pick("__rts").alias("__mts"),
            *[pick(f"__rv_{c}").alias(f"__m_{c}") for c in value_cols],
        ).where(F.col("__tag") == 1)
    else:
        # unkeyed: distributed carry (range partition + boundary patch) —
        # never an empty-partition-spec window (utils/distributed.py)
        from tsflex_spark.utils.distributed import with_global_carry

        is_time_on = str(left.schema[on].dataType).startswith("Timestamp")
        ordn = ts_micros(on) if is_time_on else F.col(on).cast("double")
        if direction == "forward":
            ordn = -ordn
        u = u.withColumn("__ord", ordn)
        carried = with_global_carry(u, carry_cols, ["__ord", "__tag"], out_prefix="__m_")
        carried = (
            carried.where(F.col("__tag") == 1)
            .withColumnRenamed("__m___rts", "__mts")
            .drop("__ord", *carry_cols)
        )
        for c in value_cols:
            carried = carried.withColumnRenamed(f"__m___rv_{c}", f"__m_{c}")

    if tolerance is not None:
        is_time = str(left.schema[on].dataType).startswith("Timestamp")
        tol_n = to_numeric_units(tolerance, is_time)
        if is_time:
            dist = F.abs(ts_micros(on) - ts_micros("__mts"))
        else:
            dist = F.abs(F.col(on) - F.col("__mts"))
        in_tol = F.col("__mts").isNotNull() & (dist <= F.lit(tol_n))
    else:
        in_tol = F.col("__mts").isNotNull()

    out = carried
    for c in value_cols:
        out = out.withColumn(out_names[c], F.when(in_tol, F.col(f"__m_{c}")))
    out = out.withColumn(f"{on}{suffix}", F.when(in_tol, F.col("__mts")))
    drop = ["__tag", "__mts"] + [f"__m_{c}" for c in value_cols]
    return out.drop(*drop)
