"""Sources: parquet/csv/json readers with nanosecond-timestamp handling.

The reference's only built-in reader is a parquet loader
(tsflex/utils/data.py:161-193); Spark gives every format for free. The one
real gap: Spark (as of 4.x) rejects parquet TIMESTAMP(NANOS) columns
(PARQUET_TYPE_ILLEGAL). ``read_parquet`` transparently reads them via the
``nanosAsLong`` legacy conf and rewrites the column to a microsecond
TimestampType with exact integer division (``ns div 1000`` — never through
double, which loses precision above 2^53).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nanos_ts_cols(path: str) -> list[str]:
    try:
        schema = pq.read_schema(path.removeprefix("file://"))
    except Exception:
        return []
    import pyarrow as pa

    return [
        f.name
        for f in schema
        if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
    ]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` that tolerates TIMESTAMP(NANOS) columns."""
    ns_cols = _nanos_ts_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    # left set for the session: the scan may consult it again at execution
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    ts_col: Optional[str] = None,
    ts_format: Optional[str] = None,
    schema: Optional[str] = None,
    **options,
) -> DataFrame:
    """CSV reader with optional timestamp parsing.

    Prefer an explicit ``schema`` (DDL string) at scale — ``inferSchema``
    (the fallback) costs one extra full pass over the files. ``ts_col``
    (+ optional ``ts_format``) parses a string column to TIMESTAMP.
    """
    reader = spark.read.options(header="true", **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    if ts_col is not None and not str(df.schema[ts_col].dataType).startswith("Timestamp"):
        col = (
            F.to_timestamp(F.col(ts_col), ts_format)
            if ts_format
            else F.to_timestamp(F.col(ts_col))
        )
        df = df.withColumn(ts_col, col)
    return df


def read_json(
    spark: SparkSession,
    path: str,
    ts_col: Optional[str] = None,
    ts_format: Optional[str] = None,
    schema: Optional[str] = None,
    **options,
) -> DataFrame:
    """JSON-lines reader with optional timestamp parsing (same contract
    as ``read_csv``; explicit ``schema`` avoids the inference pass)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if ts_col is not None and not str(df.schema[ts_col].dataType).startswith("Timestamp"):
        col = (
            F.to_timestamp(F.col(ts_col), ts_format)
            if ts_format
            else F.to_timestamp(F.col(ts_col))
        )
        df = df.withColumn(ts_col, col)
    return df


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC reader. ORC stores timestamps as instants (no NTZ ambiguity)
    and supports the same predicate pushdown / column pruning as parquet;
    every downstream operator is format-agnostic, so a corpus in ORC
    needs no conversion pass."""
    return spark.read.options(**options).orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink, optionally hive-partitioned (same pruning story as
    ``write_partitioned``)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 64,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed-table sink for co-located joins and shuffle-free
    aggregations (the "bucketing" leg of the scale design).

    Writing the big fact tables bucketed on their join/group key means a
    later ``join``/``groupBy`` on that key needs NO Exchange on the
    bucketed side(s): Spark matches the table's hash-bucket layout to the
    required distribution at plan time. ``sort_cols`` additionally
    pre-sorts within buckets (sort-merge join without the sort).
    Bucketing requires the table catalog (``saveAsTable``) — a plain
    ``.parquet(path)`` write silently drops bucket metadata.
    """
    w = df.write.bucketBy(int(n_buckets), *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode(mode).format("parquet").saveAsTable(table)


def write_partitioned(
    df,
    path: str,
    partition_by=("ds",),
    ts_col: str = "ts",
    mode: str = "overwrite",
    dynamic: bool = False,
) -> None:
    """Feature-frame sink for cluster-scale outputs: derive a date
    partition column from ``ts_col`` when asked for and not present, then
    write hive-partitioned parquet. Readers that filter on the partition
    column scan only the matching directories (PartitionFilters — pruning
    happens before any file is opened), which is the difference between
    touching 1 day and 100 TB on a historical query.

    ``dynamic=True`` enables dynamic partition overwrite for this write:
    only the partitions PRESENT IN ``df`` are replaced, everything else
    is untouched — the idempotent daily-backfill pattern (re-running one
    day's feature extraction rewrites that day's directory, never the
    historical 100 TB).
    """
    from pyspark.sql import functions as F

    partition_by = list(partition_by)
    out = df
    if "ds" in partition_by and "ds" not in df.columns:
        out = out.withColumn("ds", F.to_date(F.col(ts_col)))
    w = out.write.partitionBy(*partition_by).mode(mode)
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.parquet(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    partition_by: Optional[Sequence[str]] = None,
    n_files: Optional[int] = None,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, within-file-sorted parquet — the layout that
    makes parquet ROW-GROUP statistics effective.

    Directory partitioning (``write_partitioned``) prunes whole
    directories; this prunes WITHIN them: ``repartitionByRange`` gives
    every output file a disjoint ``sort_cols`` range and the in-file
    sort keeps row-group min/max tight, so a predicate on the sort key
    (a time-range scan, an id lookup) skips whole files and row groups
    from the footer stats alone — no data pages read. The standard
    lakehouse practice for time-series facts: partition by day, sort by
    (key, ts) inside.

    ``n_files`` bounds the number of output files (defaults to the
    current shuffle parallelism).
    """
    cols = [F.col(c) for c in sort_cols]
    d = (
        df.repartitionByRange(int(n_files), *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    d = d.sortWithinPartitions(*cols)
    w = d.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*list(partition_by))
    w.parquet(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 128,
    sort_cols: Optional[Sequence[str]] = None,
) -> int:
    """Compact a small-file parquet dataset into ~``target_mb`` files.

    Streaming sinks and incremental appends (e.g. the LSH store, a
    foreachBatch output) accumulate many tiny files; scans then pay
    per-file open/footer costs that dwarf the data. This rewrites
    ``src`` into ``ceil(bytes / target_mb)`` files at ``dst``
    (optionally re-sorted so stats stay tight) and returns the file
    count. Compaction into a NEW directory, then swap, is deliberate:
    an in-place rewrite that dies midway corrupts the dataset; a
    directory swap is the atomic unit the filesystem gives us.
    """
    import math

    # Size via the Hadoop FileSystem API so s3a:// / hdfs:// / file://
    # all resolve — an os.walk would see 0 bytes on any non-local path
    # and silently coalesce a 100 TB dataset into ONE file/task.
    jpath = spark._jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    d = spark.read.parquet(src)
    if sort_cols:
        d = d.repartitionByRange(n, *[F.col(c) for c in sort_cols])
        d = d.sortWithinPartitions(*[F.col(c) for c in sort_cols])
    else:
        d = d.coalesce(n)
    d.write.mode("overwrite").parquet(dst)
    return n


def write_zorder(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    n_files: Optional[int] = None,
    bits: int = 8,
    mode: str = "overwrite",
    partition_by: Optional[Sequence[str]] = None,
) -> None:
    """Z-ORDER layout: multi-column data skipping for parquet scans.

    ``write_sorted`` makes footer stats tight for ONE leading key; a
    predicate on any other column still reads every file. This writer
    interleaves the bits of per-column QUANTILE buckets (``bits`` per
    column — rank-bucketed, so skew cannot collapse a dimension) into a
    Morton z-key, range-partitions files by it, and sorts within files —
    every output file then covers a small hyper-rectangle of the key
    space, so footer min/max prune files for predicates on EACH z-order
    column independently (the Delta/iceberg OPTIMIZE ZORDER layout,
    expressed with open Spark APIs).

    Bucket cut points come from one ``percentile_approx`` pass (a tiny
    bounded collect: ``(2^bits - 1) × n_cols`` doubles); the z-key is
    computed in one Arrow batch pass (vectorized ``np.searchsorted`` +
    bit interleave — a per-row literal-array fold would run in the
    interpreted HOF evaluator). Columns must be numeric/timestamp;
    NULLs sort into the top bucket.
    """
    from pyspark.sql.functions import pandas_udf

    cols = list(zorder_cols)
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns; use write_sorted for one")
    if bits * len(cols) > 62:
        raise ValueError(f"bits({bits}) * n_cols({len(cols)}) must fit a long")
    nb = 1 << int(bits)
    qs = [float(i) / nb for i in range(1, nb)]
    cast = [F.col(c).cast("double").alias(c) for c in cols]
    cut_row = df.select(cast).agg(
        *[F.percentile_approx(c, F.array(*[F.lit(q) for q in qs]), 10000).alias(c) for c in cols]
    ).collect()[0]
    cuts = {c: np.asarray([v for v in (cut_row[c] or []) if v is not None], dtype=np.float64)
            for c in cols}
    ncols = len(cols)
    top = nb - 1

    @pandas_udf("long")
    def _zkey(s: pd.DataFrame) -> pd.Series:
        z = np.zeros(len(s), dtype=np.int64)
        for i, c in enumerate(cols):
            v = s[c].to_numpy(dtype=np.float64, na_value=np.nan)
            b = np.searchsorted(cuts[c], v, side="right").astype(np.int64)
            b[np.isnan(v)] = top
            np.clip(b, 0, top, out=b)
            for bit in range(int(bits)):
                z |= ((b >> bit) & 1) << (bit * ncols + i)
        return pd.Series(z)

    d = df.withColumn(
        "__z", _zkey(F.struct(*[F.col(c).cast("double").alias(c) for c in cols]))
    )
    d = (
        d.repartitionByRange(int(n_files), F.col("__z"))
        if n_files
        else d.repartitionByRange(F.col("__z"))
    )
    d = d.sortWithinPartitions("__z").drop("__z")
    w = d.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*list(partition_by))
    w.parquet(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: Optional[str] = "gzip",
    num_files: Optional[int] = None,
    mode: str = "overwrite",
) -> None:
    """JSON-lines sink — the LLM-corpus interchange format (one JSON
    object per line; ``compression`` in {gzip, zstd (codec availability
    permitting), none}). ``num_files`` shards the output (repartition by
    round-robin — a pure write-layout choice, no key semantics); leave it
    None to keep the upstream partitioning and avoid the extra exchange.
    """
    out = df
    if num_files is not None:
        out = out.repartition(int(num_files))
    w = out.write.mode(mode)
    if compression and compression != "none":
        w = w.option("compression", compression)
    w.json(path)
