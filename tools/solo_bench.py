"""Solo per-query timing: build + noop-execute selected queries N times
and print min/mean, with optional quiescence wait. Unlike bench.py this
times a subset in isolation (guide §1.4: noop sink; §1.5: labeled jobs).

Usage: python tools/solo_bench.py [-n N] [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from tsflex_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        args = args[1:]
    names = args

    spark = get_spark("solo_bench")
    queries = entry_mod.queries()
    legs = entry_mod.query_legs() if hasattr(entry_mod, "query_legs") else {}
    out = {}
    for name in names:
        gate, _, leg = name.partition(":")
        if leg:
            fn = legs[gate][leg]
        else:
            fn = queries[name]
        times = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"solo:{name}#{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = times
        print(
            f"{name}: min={min(times):.3f} mean={sum(times)/len(times):.3f} "
            f"all={[round(t, 3) for t in times]} load={os.getloadavg()[0]:.1f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
