"""File-layout sinks: write_sorted's disjoint per-file ranges (the
row-group-stats pruning contract) and compact_parquet's file-count and
content preservation."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tsflex_spark.sources.io import compact_parquet, write_sorted


def _files(path):
    out = []
    for root, _d, fs in os.walk(path):
        out += [os.path.join(root, f) for f in fs if f.endswith(".parquet")]
    return out


def test_write_sorted_disjoint_file_ranges(spark, tmp_path):
    df = spark.range(100_000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    # shuffle the input so sortedness is earned, not inherited
    df = df.orderBy(F.xxhash64("id"))
    out = str(tmp_path / "sorted")
    write_sorted(df, out, ["id"], n_files=8)
    files = _files(out)
    assert 1 < len(files) <= 8
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # disjoint file ranges: every file's max < next file's min
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # row count preserved
    assert spark.read.parquet(out).count() == 100_000


def test_write_sorted_rowgroups_sorted_within_file(spark, tmp_path):
    df = spark.range(50_000).orderBy(F.xxhash64("id"))
    out = str(tmp_path / "sorted2")
    write_sorted(df, out, ["id"], n_files=4)
    f = _files(out)[0]
    t = pq.read_table(f, columns=["id"])
    ids = t["id"].to_pylist()
    assert ids == sorted(ids)


def test_compact_parquet_reduces_files(spark, tmp_path):
    src = str(tmp_path / "many")
    # 40 tiny files
    spark.range(40_000).repartition(40).write.parquet(src)
    assert len(_files(src)) == 40
    dst = str(tmp_path / "few")
    n = compact_parquet(spark, src, dst, target_mb=128)
    assert n == 1
    assert len(_files(dst)) == 1
    assert spark.read.parquet(dst).count() == 40_000
    # value-preserving
    a = spark.read.parquet(src).agg(F.sum("id")).collect()[0][0]
    b = spark.read.parquet(dst).agg(F.sum("id")).collect()[0][0]
    assert a == b


def test_compact_parquet_with_sort(spark, tmp_path):
    src = str(tmp_path / "many2")
    spark.range(30_000).orderBy(F.xxhash64("id")).repartition(25).write.parquet(src)
    dst = str(tmp_path / "few2")
    compact_parquet(spark, src, dst, target_mb=128, sort_cols=["id"])
    f = _files(dst)[0]
    ids = pq.read_table(f, columns=["id"])["id"].to_pylist()
    assert ids == sorted(ids)


def test_write_sorted_with_partition_by(spark, tmp_path):
    """Composition: hive partitions outside, disjoint sorted ranges
    inside each partition directory."""
    df = spark.range(20_000).select(
        (F.col("id") % 2).alias("p"), F.col("id")
    ).orderBy(F.xxhash64("id"))
    out = str(tmp_path / "ps")
    write_sorted(df, out, ["id"], partition_by=["p"], n_files=4)
    for part in ("p=0", "p=1"):
        files = _files(os.path.join(out, part))
        assert files
        ranges = []
        for f in files:
            md = pq.read_metadata(f)
            mins = [md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups)]
            maxs = [md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups)]
            ranges.append((min(mins), max(maxs)))
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2
    assert spark.read.parquet(out).count() == 20_000
