"""Scale-linearity probe: replicate the sf0.1 events table Nx (shifted in
time and key space so semantics stay honest) and time the core rolling
paths at 1x and Nx. The question the probe answers is the 100 TB one —
does wall time grow linearly with data, or is something quadratic /
spine-bound hiding at test scale?

Usage: python tools/scale_probe.py [factor=10] [sf_dir=/root/testdata/sf0.1]
Prints one JSON line: {"rows_1x": ..., "rows_Nx": ..., "timings": {...}}

Findings recorded from the 2026-08 run (local[32], factor 10, 100k -> 1M
events, 1.5k -> 15k users):
- keyed 1h tumbling (default spine): 5.3 s at 10x vs ~1.4 s at 1x — linear.
- keyed 5min/1min fine stride with include_empty_windows=False: 5.1 s at
  10x — linear; the DEFAULT spine path on this config is spine-bound
  (65M grid rows from 100k events, ~32 s at 1x) — that is grid size, not
  data size, and is exactly what include_empty_windows=False is for.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tsflex_spark import FeatureCollection, FeatureDescriptor
from tsflex_spark.session import get_spark
from tsflex_spark.sources.io import read_events


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe")
    ev = read_events(spark, sf_dir).select("user_id", "ts", "value")
    big = ev
    for k in range(1, factor):
        big = big.unionByName(
            ev.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {k} DAYS"))
            .withColumn("user_id", F.col("user_id") + F.lit(k * 1_000_000))
        )
    small = ev.localCheckpoint(eager=True)
    big = big.localCheckpoint(eager=True)
    rows = {"rows_1x": small.count(), "rows_Nx": big.count()}

    tumbling = FeatureCollection(
        [FeatureDescriptor(f, "value", "1h", "1h")
         for f in ("mean", "std", "min", "max", "count")]
    )
    fine = FeatureCollection(
        [FeatureDescriptor(f, "value", "5 min", "1 min")
         for f in ("mean", "std", "min", "max", "count")]
    )

    def t(fc, d, **kw) -> float:
        t0 = time.perf_counter()
        fc.calculate(
            d, ts_col="ts", key_cols=["user_id"], approve_sparsity=True, **kw
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    timings = {
        "tumbling_1h_1x": t(tumbling, small),
        f"tumbling_1h_{factor}x": t(tumbling, big),
        "fine_lean_1x": t(fine, small, include_empty_windows=False),
        f"fine_lean_{factor}x": t(fine, big, include_empty_windows=False),
    }
    print(json.dumps({**rows, "factor": factor, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
