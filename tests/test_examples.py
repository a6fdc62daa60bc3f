"""The examples/ scripts must keep running (they are the switch-over
documentation for reference users)."""

import sys


def test_feature_extraction_example(spark):
    sys.path.insert(0, "examples")
    import feature_extraction

    # reuses the test session via get_spark's getOrCreate
    feature_extraction.main("/root/testdata/sf0.001")


def test_pretraining_data_example(spark, tmp_path):
    sys.path.insert(0, "examples")
    import pretraining_data

    pretraining_data.main("/root/testdata/sf0.001", str(tmp_path / "shards"))


def test_crawl_ingest_example(spark, tmp_path):
    sys.path.insert(0, "examples")
    import crawl_ingest

    crawl_ingest.main(str(tmp_path / "shards"))


def test_ml_pipeline_example(spark):
    sys.path.insert(0, "examples")
    import ml_pipeline

    ml_pipeline.main("/root/testdata/sf0.001")


def test_hybrid_retrieval_example(spark):
    sys.path.insert(0, "examples")
    import hybrid_retrieval

    hybrid_retrieval.main("/root/testdata/sf0.001")


def test_signal_features_example(spark):
    sys.path.insert(0, "examples")
    import signal_features

    signal_features.main("/root/testdata/sf0.001")


def test_migrate_from_tsflex_example(spark):
    sys.path.insert(0, "examples")
    import migrate_from_tsflex

    migrate_from_tsflex.main("/root/testdata/sf0.001")
