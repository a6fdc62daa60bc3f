"""Degenerate-input hardening: every major API must handle EMPTY,
single-row, and all-NULL inputs without crashing — at 100 TB a partition
or a whole upstream filter result being empty is routine, not exotic.
(The empty-query knn_join crash this suite pinned down was found by
exactly this sweep.)"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsflex_spark import FeatureCollection, FeatureDescriptor


@pytest.fixture()
def frames(spark):
    empty = spark.createDataFrame([], "ts timestamp, v double")
    one = spark.createDataFrame(
        pd.DataFrame({"ts": [pd.Timestamp("2024-01-01")], "v": [1.0]})
    )
    allnull = spark.createDataFrame(
        pd.DataFrame(
            {"ts": pd.date_range("2024-01-01", periods=5, freq="1s"), "v": [None] * 5}
        ),
        "ts timestamp, v double",
    )
    return empty, one, allnull


def test_calculate_degenerate(spark, frames):
    empty, one, allnull = frames
    fc = FeatureCollection(FeatureDescriptor("sum", "v", "10s", "10s"))
    assert fc.calculate(empty, ts_col="ts", approve_sparsity=True).count() == 0
    assert fc.calculate(one, ts_col="ts", approve_sparsity=True).count() == 0
    assert fc.calculate(allnull, ts_col="ts", approve_sparsity=True).count() == 0
    fcu = FeatureCollection(FeatureDescriptor(np.mean, "v", "10s", "10s"))
    assert fcu.calculate(empty, ts_col="ts", approve_sparsity=True).count() == 0


def test_dedup_degenerate(spark):
    from tsflex_spark.datapipe.dedup import (
        connected_components,
        minhash_dedup,
        sketch_signatures,
    )

    edocs = spark.createDataFrame([], "doc_id long, text string")
    assert sketch_signatures(edocs, "text", "doc_id").count() == 0
    assert minhash_dedup(edocs, "text", "doc_id").count() == 0
    eedges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(eedges).count() == 0


def test_knn_join_degenerate(spark):
    from tsflex_spark.datapipe.similarity import knn_join

    eemb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    q1 = spark.createDataFrame(
        [(0, [1.0, 0.0])], "q_id long, embedding array<double>"
    )
    assert knn_join(eemb, q1, k=3).count() == 0
    # empty QUERY side: empty result with the right schema, no corpus scan
    corpus = q1.select(F.col("q_id").alias("vec_id"), "embedding")
    equeries = spark.createDataFrame([], "q_id long, embedding array<double>")
    out = knn_join(corpus, equeries, k=3)
    assert out.count() == 0
    assert out.columns == ["q_id", "vec_id", "cosine", "rank"]
    out_e = knn_join(corpus, equeries, k=3, metric="euclidean")
    assert out_e.count() == 0 and out_e.columns == ["q_id", "vec_id", "d2", "rank"]


def test_relational_degenerate(spark, frames):
    from tsflex_spark.relational import asof_join, point_in_time_join

    _, one, _ = frames
    el = spark.createDataFrame([], "k long, ts timestamp, y double")
    right = one.select(F.lit(1).alias("k"), "ts", F.col("v").alias("r"))
    assert asof_join(el, right, on="ts", by=["k"], value_cols=["r"]).count() == 0
    feats = one.select(F.lit(1).alias("k"), "ts", "v")
    assert point_in_time_join(el, {"f": feats}, on="ts", by=["k"]).count() == 0


def test_processing_degenerate(spark, frames):
    from tsflex_spark.chunking import chunk_data
    from tsflex_spark.processing import SeriesPipeline, SeriesProcessor
    from tsflex_spark.processing.resample import resample_interpolate

    empty, one, _ = frames
    pl = SeriesPipeline([SeriesProcessor(np.abs, "v")])
    assert pl.process(empty, ts_col="ts").count() == 0
    assert resample_interpolate(one, ts_col="ts", value_col="v", period="1s").count() == 1
    assert resample_interpolate(empty, ts_col="ts", value_col="v", period="1s").count() == 0
    assert chunk_data(empty, ts_col="ts", max_gap="10s").count() == 0
    assert chunk_data(one, ts_col="ts", max_gap="10s").count() == 1
