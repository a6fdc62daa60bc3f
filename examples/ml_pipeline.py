"""End-to-end ML on extracted features. Run:
python examples/ml_pipeline.py [sf_dir]

FeatureCollection (per-user rolling features over events) → FRESH-style
relevance selection (Benjamini-Hochberg) → MLlib logistic regression,
composed so feature extraction, selection, assembly, and training run
as Spark jobs end-to-end — the "switch from tsflex+sklearn to
tsflex_spark+MLlib" path.
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from tsflex_spark import FeatureCollection, FeatureDescriptor
from tsflex_spark.features.selection import feature_relevance, select_features
from tsflex_spark.session import get_spark
from tsflex_spark.sources.io import read_events


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_ml")
    ev = read_events(spark, sf_dir).select("user_id", "ts", "value")

    # per-user 6h tumbling features
    fc = FeatureCollection(
        [
            FeatureDescriptor("mean", "value", "6h", "6h"),
            FeatureDescriptor("std", "value", "6h", "6h"),
            FeatureDescriptor("count", "value", "6h", "6h"),
            FeatureDescriptor("ptp", "value", "6h", "6h"),
        ]
    )
    # approve_sparsity: the sparsity watcher rides a DataFrame.observe
    # metric, which MLlib's RDD-based evaluators cannot serialize —
    # irregular per-user windows are expected here anyway
    feats = fc.calculate(
        ev,
        ts_col="ts",
        key_cols=["user_id"],
        include_empty_windows=False,
        approve_sparsity=True,
    ).localCheckpoint(eager=True)
    feat_cols = [c for c in feats.columns if "__" in c]

    # label events: is this event's value in the corpus's top half?
    med_v = ev.agg(F.median("value").alias("m")).first()["m"]
    labels = ev.select(
        "user_id",
        "ts",
        (F.col("value") > F.lit(float(med_v))).cast("double").alias("label"),
    )

    # LEAKAGE-FREE training-set assembly: each label event gets the
    # user's latest feature window strictly BEFORE the event instant
    # (feature-store point-in-time join); features staler than a day
    # stay NULL rather than leaking months-old state into training
    from tsflex_spark.relational import point_in_time_join

    pit_cols = [f"roll__{c}" for c in feat_cols]
    labeled = point_in_time_join(
        labels, {"roll": feats}, on="ts", by=["user_id"],
        tolerance="1d", strict=True,
    ).na.drop(subset=pit_cols)

    scores = feature_relevance(labeled, "label", pit_cols)
    print("top features:", [(s["feature"], round(s["p"], 4)) for s in scores[:3]])
    selected = select_features(labeled, "label", pit_cols, keep_cols=["user_id", "ts"])
    kept = [c for c in selected.columns if c in pit_cols]
    print(f"BH kept {len(kept)}/{len(pit_cols)} features")

    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from tsflex_spark.utils.ml_metrics import binary_auc

    # drop the label-defining feature so the model learns from the rest
    model_feats = [c for c in kept if "count" not in c] or kept
    # materialize the assembled training set ONCE before iterative
    # fitting: LBFGS re-evaluates its input every iteration, so without
    # this the whole feature/PIT lineage (including the sparsity
    # observation node, which Spark cannot serialize into ML tasks)
    # would recompute per iteration
    selected = selected.localCheckpoint(eager=True)
    train, test = selected.randomSplit([0.8, 0.2], seed=7)
    asm = VectorAssembler(inputCols=model_feats, outputCol="features")
    lr = LogisticRegression(featuresCol="features", labelCol="label", maxIter=20)
    model = lr.fit(asm.transform(train))
    # Score + evaluate WITHOUT MLlib on the serving path — the pattern
    # datapipe/classifier.py ships for production: the trained model is
    # (weights, intercept), so scoring is a codegen expression, and AUC
    # is the DataFrame-native Mann-Whitney (utils/ml_metrics). MLlib's
    # transform-UDF and RDD evaluator both fail to serialize in any
    # session that ever registered a DataFrame.observe Observation
    # (Spark 4 ObservationManager bug), and model.transform drags the
    # training summary -> session into its closure.
    margin = F.lit(float(model.intercept))
    for w, c in zip(model.coefficients.toArray(), model_feats):
        margin = margin + F.lit(float(w)) * F.col(c)
    pred = test.select(
        "label", (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias("score")
    )
    auc = binary_auc(pred, "label", "score")
    print(f"AUC on held-out windows: {auc:.3f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
