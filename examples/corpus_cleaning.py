"""End-to-end LLM training-corpus cleaning. Run:
python examples/corpus_cleaning.py [sf_dir]

Normalize → heuristic + trained-classifier quality filtering →
decontamination-ready audit → exact + near dedup, then a drift check
between the raw and cleaned corpus.
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from tsflex_spark.datapipe.classifier import label_frames, train_quality_classifier
from tsflex_spark.datapipe.pipeline import clean_corpus
from tsflex_spark.datapipe.text import normalize_text
from tsflex_spark.session import get_spark
from tsflex_spark.utils.drift import feature_drift


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_cleaning")
    docs = normalize_text(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "text"
    )

    # train a quality classifier on weak labels: longest docs as "good"
    # seeds, shortest as "bad" (a stand-in for curated-vs-raw seed sets)
    pos = docs.orderBy(F.desc("n_chars")).limit(50).select("doc_id", "text")
    neg = docs.orderBy(F.asc("n_chars")).limit(50).select("doc_id", "text")
    clf = train_quality_classifier(
        label_frames(pos, neg, "text", "doc_id"), "text", "doc_id", dim=64
    )

    cleaned = clean_corpus(
        docs,
        "text",
        "doc_id",
        min_quality_score=0.3,
        quality_classifier=clf,
        classifier_min_prob=0.2,
        near_dup_threshold=0.8,
    )
    n_raw, n_clean = docs.count(), cleaned.count()
    print(f"kept {n_clean}/{n_raw}")

    drift = feature_drift(
        docs.select(F.length("text").alias("len")),
        cleaned.select(F.length("text").alias("len")),
        ["len"],
    )
    print("length drift raw→clean:", drift[0])


if __name__ == "__main__":
    main(*sys.argv[1:])
