"""cut_lineage — the engine's single lineage-cut surface.

Default: eager localCheckpoint (unchanged r10 behavior). With
``spark.tsflex.reliableCheckpoint=true`` AND a checkpoint dir set, the
cut becomes a RELIABLE ``checkpoint()`` — recoverable after executor
loss (the 100 TB / preemptible-nodes trade the r10 verdict asked to
expose). The flag without a dir must silently stay local (checkpoint()
would throw)."""

import os

import pytest
from pyspark.sql import functions as F

from tsflex_spark.utils.data import cut_lineage


def _is_checkpointed_local(df) -> bool:
    # a checkpoint truncates the logical plan to a LogicalRDD leaf
    return "LogicalRDD" in df._jdf.queryExecution().optimizedPlan().toString()


def test_default_is_local_checkpoint(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = cut_lineage(df)
    assert _is_checkpointed_local(out)
    assert out.count() == 100


def test_flag_without_dir_falls_back_to_local(spark):
    if spark.sparkContext._jsc.sc().getCheckpointDir().isDefined():
        pytest.skip("another test set a checkpoint dir on the shared session")
    spark.conf.set("spark.tsflex.reliableCheckpoint", "true")
    try:
        out = cut_lineage(spark.range(10))
        assert out.count() == 10
        assert _is_checkpointed_local(out)
    finally:
        spark.conf.unset("spark.tsflex.reliableCheckpoint")


def test_flag_with_dir_uses_reliable_checkpoint(spark, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    spark.conf.set("spark.tsflex.reliableCheckpoint", "true")
    try:
        df = spark.range(50).withColumn("v", F.col("id") + 1)
        out = cut_lineage(df)
        assert out.count() == 50
        assert [r["v"] for r in out.orderBy("id").collect()] == list(range(1, 51))
        # the reliable checkpoint wrote RDD blocks under the dir
        wrote = any(
            files for _root, _dirs, files in os.walk(ckpt_dir)
        )
        assert wrote, "reliable checkpoint left no files under the checkpoint dir"
    finally:
        spark.conf.unset("spark.tsflex.reliableCheckpoint")
