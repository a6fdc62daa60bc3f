"""Switch an existing tsflex configuration to Spark in one call. Run:
python examples/migrate_from_tsflex.py [sf_dir]

The scenario: a team has a module of tsflex ``FeatureCollection`` /
``SeriesPipeline`` objects tuned over years on single-machine pandas,
and the data has outgrown one machine. ``from_tsflex`` converts those
objects — unchanged — into tsflex_spark declarations; the same window/
stride grammar, output naming, and function semantics then execute as a
distributed Spark plan (numpy callables compile to JVM aggregates,
custom callables run in the Arrow UDF tier).

When the real tsflex library is importable (here: the reference
checkout), this example builds the config through tsflex itself; when it
is not, it builds structurally identical stand-in objects — the point
being that ``from_tsflex`` needs only the reference's documented
attribute surface, not the package.
"""

import sys

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from tsflex_spark import from_tsflex
from tsflex_spark.session import get_spark


def _tsflex_config():
    """Build the legacy config with the REAL tsflex when available."""
    try:
        sys.path.insert(0, "/root/reference")
        sys.path.insert(0, "tests")
        from _reference_shim import install_reference

        if install_reference() is None:
            raise ImportError
        from tsflex.features import (
            FeatureCollection,
            FeatureDescriptor,
            FuncWrapper,
            MultipleFeatureDescriptors,
        )
    except ImportError:
        # stand-ins with the same attribute surface (duck-typing target)
        class FuncWrapper:
            def __init__(self, func, output_names=None, **kwargs):
                self.func = func
                self.kwargs = kwargs
                self.output_names = (
                    [output_names]
                    if isinstance(output_names, str)
                    else list(output_names or [func.__name__])
                )
                self.input_type = np.ndarray
                self.vectorized = False

        class FeatureDescriptor:
            def __init__(self, function, series_name, window=None, stride=None):
                self.series_name = (
                    (series_name,) if isinstance(series_name, str) else tuple(series_name)
                )
                self.window = window
                self.stride = stride if stride is None or isinstance(stride, list) else [stride]
                self.function = function

        class MultipleFeatureDescriptors:
            def __init__(self, functions, series_names, windows, strides):
                self.feature_descriptions = [
                    FeatureDescriptor(f, series_names, w, strides)
                    for f in functions
                    for w in (windows if isinstance(windows, list) else [windows])
                ]

        class FeatureCollection:
            def __init__(self, descs):
                self._feature_desc_dict = {}
                i = 0
                for d in descs:
                    fds = getattr(d, "feature_descriptions", [d])
                    for fd in fds:
                        self._feature_desc_dict[(fd.series_name, i)] = [fd]
                        i += 1

    def span(x):
        return float(np.max(x) - np.min(x))

    return FeatureCollection(
        [
            MultipleFeatureDescriptors(
                functions=[np.mean, np.std, np.min, np.max],
                series_names="value",
                windows=["2min"],
                strides="1min",
            ),
            FeatureDescriptor(
                FuncWrapper(span, output_names="range"), "value", "2min", "1min"
            ),
            FeatureDescriptor(
                FuncWrapper(np.quantile, output_names="p90", q=0.9),
                "value",
                "2min",
                "1min",
            ),
        ]
    )


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_migrate")
    legacy_fc = _tsflex_config()

    fc = from_tsflex(legacy_fc)  # <- the whole migration

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("ts", F.col("value").alias("value"), "user_id")
    )
    # same calculate contract; key_cols distributes per entity
    feats = fc.calculate(events, ts_col="ts", key_cols=["user_id"])
    n = feats.count()
    cols = [c for c in feats.columns if "__" in c]
    assert n > 0 and len(cols) == 6, (n, cols)
    print(f"migrated plan produced {n} rows x {len(cols)} features")
    print("feature columns (reference naming grammar):", cols)
    feats.orderBy("user_id", "ts").show(5, truncate=False)


if __name__ == "__main__":
    main(*sys.argv[1:])
