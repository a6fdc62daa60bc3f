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


def test_text_lm_curation_degenerate(spark):
    from tsflex_spark.datapipe.curation import corpus_stats, deterministic_split
    from tsflex_spark.datapipe.decontam import decontaminate
    from tsflex_spark.datapipe.lm import score_perplexity, train_ngram_lm
    from tsflex_spark.datapipe.pipeline import clean_corpus
    from tsflex_spark.datapipe.text import (
        chunk_documents,
        language_id,
        quality_score,
        repetition_stats,
    )

    edocs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    one = spark.createDataFrame(
        [(1, "hello world this is a doc", "en", "web", 25)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    for fn in (quality_score, language_id, repetition_stats):
        assert fn(edocs, "text", id_col="doc_id").count() == 0
    assert chunk_documents(edocs, "text", id_col="doc_id", max_tokens=10).count() == 0
    assert train_ngram_lm(edocs, "text", id_col="doc_id") is not None
    lm = train_ngram_lm(one, "text", id_col="doc_id")
    assert score_perplexity(one, lm, "text", id_col="doc_id").count() == 1
    assert deterministic_split(edocs, "doc_id", [0.8, 0.2], names=("train", "val")).count() == 0
    assert corpus_stats(edocs, text_col="text", source_col="source").count() == 0
    assert decontaminate(edocs, one, text_col="text", id_col="doc_id").count() == 0
    assert decontaminate(one, edocs, text_col="text", id_col="doc_id").count() == 1
    assert clean_corpus(edocs, text_col="text", id_col="doc_id").count() == 0


def test_loud_guards_on_unusable_inputs(spark):
    """Ops whose result would be meaningless on empty input raise CLEAR
    errors instead of silently returning nothing."""
    from tsflex_spark.datapipe.embedding import kmeans_fit, pca_train
    from tsflex_spark.datapipe.retrieval import bm25_score

    edocs = spark.createDataFrame([], "doc_id long, text string")
    one = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    eemb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_score(edocs, "hello", text_col="text", id_col="doc_id")
    with pytest.raises(ValueError, match="no tokens"):
        bm25_score(one, "", text_col="text", id_col="doc_id")
    with pytest.raises(ValueError, match="non-null vectors"):
        pca_train(eemb, k=2)
    with pytest.raises(ValueError, match="non-null vectors"):
        kmeans_fit(eemb, k=2)


def test_distributed_helpers_degenerate(spark):
    from tsflex_spark.processing.anomaly import anomaly_zscore
    from tsflex_spark.processing.downsample import lttb
    from tsflex_spark.utils.distributed import exact_quantiles, with_global_shift

    empty = spark.createDataFrame([], "ts timestamp, value double, k long")
    assert with_global_shift(empty, ["value"], "ts", ["value_lag"]).count() == 0
    assert exact_quantiles(empty.select("value"), "value", [0.5]).count() == 1
    assert anomaly_zscore(empty, "ts", "value", "60s", ["k"]).count() == 0
    assert lttb(empty, ts_col="ts", value_col="value", n_out=10).count() == 0


def test_pack_and_tokens_reuse_degenerate(spark):
    """Round-8 APIs: deterministic packing on empty/singleton/oversize
    inputs, and the tokens= reuse paths on empty corpora."""
    from pyspark.sql import functions as F
    from tsflex_spark.datapipe.dedup import span_gram_rows
    from tsflex_spark.datapipe.text import pack_sequences, top_ngrams

    empty = spark.createDataFrame([], "doc_id long, n_tok long")
    out = pack_sequences(
        empty, "n_tok", budget=100, deterministic=True,
        id_col="doc_id", num_buckets=4,
    )
    assert out.count() == 0 and "bin_id" in out.columns

    one = spark.createDataFrame([(7, 1000)], "doc_id long, n_tok long")
    row = pack_sequences(
        one, "n_tok", budget=100, deterministic=True,
        id_col="doc_id", num_buckets=4,
    ).collect()[0]
    # oversize row gets a bin of its own; bucket rides the high bits
    assert row["bin_id"] & ((1 << 40) - 1) == 0

    import pytest

    with pytest.raises(ValueError, match="num_buckets"):
        pack_sequences(
            one, "n_tok", budget=100, deterministic=True,
            id_col="doc_id", num_buckets=0,
        )

    etok = spark.createDataFrame([], "doc_id long, __t array<string>")
    assert span_gram_rows(
        None, "text", "doc_id", n=3, tokens=etok
    ).count() == 0
    edocs = spark.createDataFrame([], "doc_id long, text string")
    assert top_ngrams(edocs, n=2, k=5, tokens=etok).count() == 0
