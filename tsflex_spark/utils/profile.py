"""One-pass column profiling and snapshot diffing for pipeline outputs.

``profile_columns`` answers "what does this table look like" (null
fractions, ranges, approximate cardinalities) in ONE aggregate scan —
the pre-flight check before keying, joining, or bucketing a 100 TB
table on a column you haven't seen. ``diff_snapshots`` answers "what
changed between yesterday's output and today's" (added / removed /
changed row counts and examples) with one full-outer hash-compare join
on the key — the regression check for incremental backfills.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(df: DataFrame, cols: Optional[Sequence[str]] = None) -> DataFrame:
    """Per-column profile in ONE aggregate pass: row count, null count /
    fraction, approximate distinct count, and (numeric/timestamp
    columns) min/max. Returns a small (column, metric...) DataFrame —
    collect it freely, it has one row per profiled column.
    """
    names = list(cols) if cols is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        aggs += [
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"__null_{c}"),
            F.approx_count_distinct(c).alias(f"__dist_{c}"),
        ]
        dt = df.schema[c].dataType
        if isinstance(dt, _NUMERIC) or isinstance(dt, (T.TimestampType, T.DateType)):
            aggs += [
                F.min(c).cast("string").alias(f"__min_{c}"),
                F.max(c).cast("string").alias(f"__max_{c}"),
            ]
    row = df.agg(*aggs).first()
    n = row["__n"]
    out = []
    for c in names:
        nn = row[f"__null_{c}"]
        out.append(
            (
                c,
                df.schema[c].dataType.simpleString(),
                n,
                nn,
                (float(nn) / n) if n else 0.0,
                row[f"__dist_{c}"],
                row[f"__min_{c}"] if f"__min_{c}" in row.asDict() else None,
                row[f"__max_{c}"] if f"__max_{c}" in row.asDict() else None,
            )
        )
    spark = df.sparkSession
    from tsflex_spark.utils.data import local_rows_df

    # JVM-local result frame (a list createDataFrame is a Python-RDD
    # whose every consumption pays Python-worker round trips)
    return local_rows_df(
        spark,
        out,
        "column string, dtype string, n_rows long, n_null long, "
        "null_frac double, approx_distinct long, min string, max string",
    )


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key_cols``: returns
    ``(keys..., change)`` where change ∈ {added, removed, changed} —
    unchanged rows are dropped. Comparison hashes the ``compare_cols``
    (default: all shared non-key columns) with ``xxhash64``, so the
    full-outer join exchanges only (key, 8-byte hash) per side — never
    the payload columns.
    """
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    cmp_cols = list(compare_cols)

    def _h(df: DataFrame, alias: str) -> DataFrame:
        h = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cmp_cols]) \
            if cmp_cols else F.lit(0)
        return df.select(*keys, h.alias(alias))

    o = _h(old, "__ho")
    nw = _h(new, "__hn")
    j = o.join(nw, on=keys, how="full")
    change = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .drop("__ho", "__hn")
    )
