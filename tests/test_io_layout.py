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


def test_write_zorder_skips_on_both_columns(spark, tmp_path):
    from tsflex_spark.sources.io import write_zorder

    n = 100_000
    # two INDEPENDENT uniform dimensions: a plain sort can only tighten one
    df = spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)).alias("y"),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zorder(df, zpath, ["x", "y"], n_files=16)
    write_sorted(df, spath, ["x"], n_files=16)

    def spans(path, col_idx):
        out = []
        for f in _files(path):
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append(max(maxs) - min(mins))
        return out

    # schema order: id, x, y -> x is col 1, y is col 2
    zx, zy = spans(zpath, 1), spans(zpath, 2)
    sx, sy = spans(spath, 1), spans(spath, 2)
    full = 999
    # the x-sorted layout: x tight, y spans ~everything in every file
    assert max(sx) < full * 0.3
    assert min(sy) > full * 0.8
    # z-order: BOTH dimensions materially tighter than full range ON
    # AVERAGE (files at range-partition boundaries can straddle a Morton
    # high-bit flip and span wide — that's inherent to the curve; the
    # expected scan fraction is what matters)
    assert sum(zx) / len(zx) < full * 0.5
    assert sum(zy) / len(zy) < full * 0.5
    # round trip
    assert spark.read.parquet(zpath).count() == n
    with pytest.raises(ValueError, match=">= 2"):
        write_zorder(df, str(tmp_path / "bad"), ["x"])
    with pytest.raises(ValueError, match="fit a long"):
        write_zorder(df, str(tmp_path / "bad"), ["x", "y"], bits=32)


def test_write_zorder_null_and_skew(spark, tmp_path):
    from tsflex_spark.sources.io import write_zorder

    # heavy skew on x (90% one value) + NULLs: quantile buckets keep the
    # other dimension useful and nothing is lost
    df = spark.range(20_000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, F.lit(5.0)).otherwise(F.col("id").cast("double")).alias("x"),
        F.when(F.col("id") % 100 == 0, F.lit(None).cast("double"))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double")).alias("y"),
    )
    out = str(tmp_path / "zs")
    write_zorder(df, out, ["x", "y"], n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == 20_000
    assert back.where(F.col("y").isNull()).count() == 200


def test_write_jsonl_roundtrip(spark, tmp_path):
    """write_jsonl -> read_json round-trips content; gzip parts on disk;
    num_files controls shard count."""
    import glob
    import pandas as pd

    from tsflex_spark.sources.io import read_json, write_jsonl

    pdf = pd.DataFrame(
        {"doc_id": range(20), "text": [f"doc {i} body" for i in range(20)]}
    )
    path = str(tmp_path / "corpus_jsonl")
    write_jsonl(spark.createDataFrame(pdf), path, num_files=3)
    parts = glob.glob(f"{path}/part-*.json.gz")
    assert len(parts) == 3, parts
    back = read_json(spark, path, schema="doc_id long, text string").toPandas()
    back = back.sort_values("doc_id").reset_index(drop=True)
    assert back.equals(pdf)

    plain = str(tmp_path / "corpus_plain")
    write_jsonl(spark.createDataFrame(pdf), plain, compression="none")
    assert glob.glob(f"{plain}/part-*.json")
