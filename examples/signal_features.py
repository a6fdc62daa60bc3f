"""Signal-analysis feature extraction — the biosignal-style workflow the
reference targets (EDA/ECG/ACC processing), on Spark.
Run: python examples/signal_features.py [sf_dir]

One FeatureCollection mixes all three execution tiers over the events
table:

- native codegen aggregates (mean/std/argmax/variation coefficient),
- change features via ONE multi-column global shift (tsfresh
  mean_change / number_crossing_m as pure Catalyst),
- batched-FFT / shape / entropy features through the vectorized UDF
  tier (spectral stats, acf sweep, permutation entropy, peaks).
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from tsflex_spark import FeatureCollection, FeatureDescriptor, FuncWrapper
from tsflex_spark.features.shape import number_peaks, permutation_entropy
from tsflex_spark.features.spectral import autocorr_sweep, spectral_stats
from tsflex_spark.session import get_spark
from tsflex_spark.sources.io import read_events
from tsflex_spark.utils.distributed import with_global_shift


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_signal")
    ev = read_events(spark, sf_dir).select("ts", "value")
    # one range exchange carries the lag column for every change feature
    ev = with_global_shift(ev, ["value"], "ts", ["value_lag"], offset=-1)

    fc = FeatureCollection(
        [
            # native tier
            FeatureDescriptor("mean", "value", "30m", "15m"),
            FeatureDescriptor("std", "value", "30m", "15m"),
            FeatureDescriptor("argmax", "value", "30m", "15m"),
            FeatureDescriptor("variation_coefficient", "value", "30m", "15m"),
            # change features (shift recipe, still all-JVM)
            FeatureDescriptor("mean_diff", ("value", "value_lag"), "30m", "15m"),
            FeatureDescriptor(
                FuncWrapper("crossings", output_names="x50", t=50.0),
                ("value", "value_lag"), "30m", "15m",
            ),
            # vectorized UDF tier (batched FFT / ordinal patterns / peaks)
            FeatureDescriptor(spectral_stats(fs=1.0), "value", "30m", "15m"),
            FeatureDescriptor(autocorr_sweep(3), "value", "30m", "15m"),
            FeatureDescriptor(permutation_entropy(3), "value", "30m", "15m"),
            FeatureDescriptor(number_peaks(2), "value", "30m", "15m"),
        ]
    )
    feats = fc.calculate(
        ev, ts_col="ts", include_empty_windows=False, approve_sparsity=True
    )
    feats.orderBy("ts").show(5, truncate=False)
    print("rows:", feats.count())
    # downstream: pair with features/selection.py relevance + BH selection
    n_cols = len(feats.columns)
    print("feature columns:", n_cols - 1)


if __name__ == "__main__":
    main(*sys.argv[1:])
