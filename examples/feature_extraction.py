"""End-to-end strided-rolling feature extraction — the tsflex workflow
on Spark. Run: python examples/feature_extraction.py [sf_dir]

Computes per-user 5-minute/1-minute rolling statistics over the driver
events table, with a custom Python feature alongside the native ones,
then selects the target-relevant columns.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from tsflex_spark import FeatureCollection, FeatureDescriptor, FuncWrapper
from tsflex_spark.features.spectral import spectral_stats
from tsflex_spark.session import get_spark
from tsflex_spark.sources.io import read_events


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_features")
    ev = read_events(spark, sf_dir).select("ts", "user_id", "value")

    fc = FeatureCollection(
        [
            # native tier: these compile to JVM aggregates
            FeatureDescriptor("mean", "value", "5m", "1m"),
            FeatureDescriptor("std", "value", "5m", "1m"),
            FeatureDescriptor("max", "value", "5m", "1m"),
            # UDF tier: arbitrary Python, Arrow-batched
            FeatureDescriptor(
                FuncWrapper(lambda v: float(np.ptp(v)) if len(v) else None,
                            output_names="ptp"),
                "value", "5m", "1m",
            ),
            # vectorized UDF tier: one batched FFT over the stacked
            # (n_segments, window) Arrow bucket
            FeatureDescriptor(spectral_stats(fs=1.0), "value", "5m", "1m"),
        ]
    )
    feats = fc.calculate(
        ev, ts_col="ts", key_cols=["user_id"],
        include_empty_windows=False, approve_sparsity=True,
    )
    feats.show(5, truncate=False)
    print("rows:", feats.count())


if __name__ == "__main__":
    main(*sys.argv[1:])
