"""Quality-classifier tests: separation on synthetic seed sets, numpy
featurizer parity, scalar-scorer vs vector-featurizer agreement,
persistence, and the Pareto noisy threshold's distributional shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsflex_spark.datapipe.classifier import (
    QualityClassifier,
    label_frames,
    mean_hash_features,
    pareto_keep_col,
    quality_filter,
    score_quality,
    train_quality_classifier,
)

GOOD = [
    "The committee published its findings after a careful two year review.",
    "Researchers observed a steady decline in error rates across trials.",
    "She walked along the river while the morning light touched the water.",
    "A clear explanation of the method appears in the second chapter.",
    "The orchestra rehearsed the quiet passage until it sounded effortless.",
    "Local farmers reported a strong harvest despite the late spring frost.",
    "The museum restored the painting using techniques from the original era.",
    "His argument rests on three premises, each supported by evidence.",
    "The library extended its hours during the examination period.",
    "Engineers tested the bridge design under a range of load conditions.",
]
JUNK = [
    "zzzz qqqq xxxx kkkk 9999 @@@@ #### $$$$ %%%% ^^^^",
    "buy now click here buy now click here buy now click here",
    "asdf jkl; asdf jkl; asdf jkl; asdf jkl; asdf jkl;",
    "0101010101 1010101010 0101010101 1010101010",
    "w1n fr33 m0n3y w1n fr33 m0n3y w1n fr33 m0n3y",
    "@@@ ### $$$ %%% ^^^ &&& *** ((( ))) ___ +++",
    "xqzj vkwp bghf mntd rslc xqzj vkwp bghf mntd",
    "!!!! ???? !!!! ???? !!!! ???? !!!! ???? !!!!",
    "lorem999 ipsum888 dolor777 sit666 amet555 consect444",
    "kkkkkkkk wwwwwwww qqqqqqqq zzzzzzzz xxxxxxxx",
]


@pytest.fixture(scope="module")
def clf(spark):
    pos = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD)], "doc_id long, text string"
    )
    neg = spark.createDataFrame(
        [(i, t) for i, t in enumerate(JUNK)], "doc_id long, text string"
    )
    labeled = label_frames(pos, neg, "text", "doc_id")
    return train_quality_classifier(
        labeled, "text", "doc_id", dim=64, ngram=3, max_iter=80, reg_param=1e-6
    )


def test_classifier_separates_seed_sets(spark, clf):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD + JUNK)], "doc_id long, text string"
    )
    scored = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(docs, clf, "text", "doc_id").collect()
    }
    good_scores = [scored[i] for i in range(len(GOOD))]
    junk_scores = [scored[i] for i in range(len(GOOD), len(GOOD) + len(JUNK))]
    # training data must be cleanly separated (it is linearly separable)
    assert min(good_scores) > max(junk_scores)
    # and held-out-ish probes land on the right side
    probe = spark.createDataFrame(
        [
            (100, "The council approved the annual budget after a long debate."),
            (101, "zzz qqq xxx 999 @@@ zzz qqq xxx 999 @@@"),
        ],
        "doc_id long, text string",
    )
    p = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(probe, clf, "text", "doc_id").collect()
    }
    assert p[100] > p[101]


def test_mean_hash_features_numpy_parity(spark):
    """The training featurizer matches a direct numpy reimplementation
    (same xxhash64 buckets/signs, mean normalization)."""
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "abc")], "doc_id long, text string"
    )
    dim = 16
    feats = {
        r["doc_id"]: list(r["features"])
        for r in mean_hash_features(docs, "text", "doc_id", dim=dim, ngram=3).collect()
    }
    # reproduce with Spark's own xxhash64 on the per-gram rows (the
    # hash is engine-defined, so parity is against the same expressions)
    for did, text in [(1, "hello world"), (2, "abc")]:
        grams = [text[i : i + 3] for i in range(max(len(text) - 2, 1))]
        gdf = spark.createDataFrame([(g,) for g in grams], "g string").select(
            F.expr("pmod(xxhash64(g), 16)").alias("b"),
            F.expr("case when pmod(xxhash64(g, 1), 2) = 0 then 1 else -1 end").alias("s"),
        )
        v = np.zeros(dim)
        for r in gdf.collect():
            v[int(r["b"])] += r["s"]
        v = v / len(grams)
        assert np.allclose(feats[did], v), did


def test_empty_doc_scores_intercept(spark, clf):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    got = score_quality(docs, clf, "text", "doc_id").collect()[0]["quality_prob"]
    # empty text still yields one 1-char "gram" of "" → substr returns ""
    # or the doc falls back to intercept; either way a finite prob
    assert 0.0 <= got <= 1.0


def test_persistence_round_trip(tmp_path, spark, clf):
    p = str(tmp_path / "clf.json")
    clf.save(p)
    clf2 = QualityClassifier.load(p)
    assert clf2.weights == pytest.approx(clf.weights)
    assert clf2.intercept == pytest.approx(clf.intercept)
    assert (clf2.dim, clf2.ngram) == (clf.dim, clf.ngram)
    docs = spark.createDataFrame([(7, GOOD[0])], "doc_id long, text string")
    a = score_quality(docs, clf, "text", "doc_id").collect()[0]["quality_prob"]
    b = score_quality(docs, clf2, "text", "doc_id").collect()[0]["quality_prob"]
    assert a == pytest.approx(b, abs=1e-12)


def test_quality_filter_threshold_and_pareto(spark, clf):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD + JUNK)], "doc_id long, text string"
    )
    scored = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(docs, clf, "text", "doc_id").collect()
    }
    # threshold between the classes (absolute calibration depends on
    # regularization; separation is what the model guarantees)
    cut = (
        min(scored[i] for i in range(len(GOOD)))
        + max(scored[i] for i in range(len(GOOD), len(GOOD) + len(JUNK)))
    ) / 2
    hard = quality_filter(docs, clf, "text", "doc_id", min_prob=cut)
    kept = {r["doc_id"] for r in hard.select("doc_id").collect()}
    assert set(range(len(GOOD))) <= kept
    assert not kept & set(range(len(GOOD), len(GOOD) + len(JUNK)))
    # pareto mode: deterministic given seed, and the noisy threshold
    # still favors the high-scoring class (keep prob = (2-s)^-alpha)
    par1 = {
        r["doc_id"]
        for r in quality_filter(
            docs, clf, "text", "doc_id", pareto_alpha=4.0, seed=3
        ).select("doc_id").collect()
    }
    par2 = {
        r["doc_id"]
        for r in quality_filter(
            docs, clf, "text", "doc_id", pareto_alpha=4.0, seed=3
        ).select("doc_id").collect()
    }
    assert par1 == par2
    good_kept = len(par1 & set(range(len(GOOD))))
    junk_kept = len(par1 & set(range(len(GOOD), len(GOOD) + len(JUNK))))
    assert good_kept > junk_kept
    with pytest.raises(ValueError):
        quality_filter(docs, clf, "text", "doc_id")
    with pytest.raises(ValueError):
        quality_filter(docs, clf, "text", "doc_id", min_prob=0.5, pareto_alpha=9.0)


def test_pareto_keep_rate_matches_distribution(spark):
    """For score s, P(keep) = P(pareto > 1-s) = (2-s)^(-alpha) (Lomax
    survival). Check the empirical rate over many hashed ids."""
    alpha = 3.0
    score = 0.8
    n = 20000
    df = spark.range(n).select(
        F.col("id"), F.lit(float(score)).alias("s")
    )
    kept = df.filter(
        pareto_keep_col(F.col("s"), F.col("id"), alpha=alpha, seed=11)
    ).count()
    expect = (2.0 - score) ** (-alpha)
    assert kept / n == pytest.approx(expect, abs=0.02)


def test_scoring_runs_on_a_stream(spark, tmp_path, clf):
    """The scorer aggregates per doc — in streaming that is a stateful
    agg, so the documented stream path is score-then-filter in a
    foreachBatch; but the narrow pareto filter itself is stream-safe.
    Here: batch-score parity between two partitionings (shuffle
    independence of the scalar sum)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD)], "doc_id long, text string"
    )
    a = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(docs.repartition(1), clf, "text", "doc_id").collect()
    }
    b = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(docs.repartition(7), clf, "text", "doc_id").collect()
    }
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-9)


def test_clean_corpus_classifier_stage(spark, clf):
    from tsflex_spark.datapipe.pipeline import clean_corpus

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD[:3] + JUNK[:3])],
        "doc_id long, text string",
    )
    out = clean_corpus(
        docs,
        "text",
        "doc_id",
        min_quality_score=0.0,
        near_dup_threshold=None,
        quality_classifier=clf,
        classifier_min_prob=0.5,
        annotate_only=True,
    )
    rows = {r["doc_id"]: r["reject_reason"] for r in out.collect()}
    # junk that survives the heuristic stages is caught by the classifier
    assert all(rows[i] is None for i in range(3))
    assert any(rows[i] == "classifier" for i in range(3, 6))
    assert set(out.columns) >= {"keep", "reject_reason", "quality_prob"}


def test_local_scorer_parity_and_stream(spark, tmp_path, clf):
    """score_quality_local must match the codegen scorer (same buckets,
    same mean) and run unchanged on a stream."""
    from tsflex_spark.datapipe.classifier import score_quality_local

    texts = GOOD[:3] + JUNK[:3] + ["", "ab", "  leading and trailing  "]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(docs, clf, "text", "doc_id").collect()
    }
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality_local(docs, clf, "text", "doc_id").collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k

    src = str(tmp_path / "src")
    docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    scored = score_quality_local(stream, clf, "text", "doc_id")
    sink = str(tmp_path / "sink")
    q = (
        scored.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sgot = {
        r["doc_id"]: r["quality_prob"]
        for r in spark.read.parquet(sink).collect()
    }
    for k in want:
        assert sgot[k] == pytest.approx(want[k], rel=1e-9)
