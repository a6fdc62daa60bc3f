"""scale_report: flags the planted hazards, stays quiet on clean plans."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from tsflex_spark.utils.plans import scale_report


def test_flags_cartesian_and_bnlj(spark):
    a = spark.range(10)
    b = spark.range(10).select(F.col("id").alias("j"))
    cross = a.crossJoin(b)
    rep = scale_report(cross)
    assert any("cartesian" in f or "nested-loop" in f for f in rep["findings"])
    # non-equi join → BNLJ
    bnlj = a.join(b, a["id"] < b["j"])
    rep2 = scale_report(bnlj)
    assert any("nested-loop" in f or "cartesian" in f for f in rep2["findings"])


def test_flags_single_partition_window(spark):
    df = spark.range(1000)
    w = Window.orderBy("id")  # unpartitioned window = one task
    out = df.select("id", F.row_number().over(w).alias("rn"))
    rep = scale_report(out)
    assert any("single-partition" in f for f in rep["findings"])


def test_scalar_agg_combine_is_warning_not_finding(spark):
    df = spark.range(1000)
    out = df.agg(F.sum("id"))
    rep = scale_report(out)
    assert not rep["findings"]
    assert any("single-partition" in w for w in rep["warnings"])


def test_flags_row_python_udf(spark):
    from pyspark.sql.functions import udf

    f = udf(lambda x: x + 1, "long")
    out = spark.range(100).select(f("id").alias("y"))
    rep = scale_report(out)
    assert any("BatchEvalPython" in f or "row-at-a-time" in f for f in rep["findings"])


def test_clean_equi_join_passes(spark):
    a = spark.range(1000).select("id", (F.col("id") * 2).alias("v"))
    b = spark.range(100).select("id", (F.col("id") + 1).alias("w"))
    out = a.join(b, "id").groupBy("v").count()
    rep = scale_report(out)
    assert rep["findings"] == []
    assert any(s.startswith("exchanges=") for s in rep["stats"])
