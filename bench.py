"""Benchmark harness: runs every headline query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"mean_total_sec": ..., "sf": ...} as the LAST stdout line (the driver
captures only the final ~2000 chars). Per-query min/mean detail is
written to BENCH_FULL.json next to this script.

Each query is timed end-to-end (plan build + execution + result fetch via
a count-style action).  A warm-up pass on the first query absorbs JVM/
session startup so per-query numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from tsflex_spark.session import get_spark


def _sentinel(spark, sf_dir: str):
    """Fixed reference query — a constant parquet scan + hash-agg whose
    plan never changes with engine code. Interleaved once per round so
    host drift is measurable FROM THE ARTIFACT: if the sentinel's
    per-round times vary, the variance is the container, not the code
    (the r8 +18% headline could only be attributed to drift via an
    out-of-band A/B; this makes that attribution mechanical)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor, not sum: summing xxhash64 longs overflows under
            # Spark 4's default ANSI mode
            F.expr("bit_xor(xxhash64(event_id))").alias("h"),
            F.expr("bit_xor(xxhash64(cast(value as string)))").alias("hv"),
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # the shared host has documented phantom-load windows (loadavg 5-9 at
    # ~95% guest idle) that inflate wall times 1.3-2x; stamp loadavg into
    # the artifact so a noisy BENCH_r{N} is identifiable as noise.
    def loadavg() -> float:
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:
            return -1.0

    # QUIESCENCE GATE (round 10): r9 proved mechanically (sentinel +
    # per-query loadavg) that bench drift is host steal, but never
    # captured a clean headline. So: before EACH measurement round, wait
    # for 1-min loadavg to fall below a threshold, drawing on one shared
    # bounded budget (default 900 s total — the protocol must terminate
    # on a never-quiet host). If the budget runs dry the fact is recorded
    # in the artifact (quiescence.timed_out) so the "this number is
    # noisy" claim is itself machine-checkable, per the r9 verdict.
    q_threshold = float(os.environ.get("SPARK_GRAFT_BENCH_QUIESCE_LOAD", "2.0"))
    q_budget = [float(os.environ.get("SPARK_GRAFT_BENCH_QUIESCE_SEC", "900"))]
    q_waited = [0.0]
    q_timeouts = [0]
    q_poll = 10.0

    def quiesce() -> float:
        """Block until loadavg < q_threshold or the shared budget is
        spent; return the loadavg observed on exit."""
        lv = loadavg()
        while lv >= q_threshold and q_budget[0] > 0:
            step = min(q_poll, q_budget[0])
            time.sleep(step)
            q_budget[0] -= step
            q_waited[0] += step
            lv = loadavg()
        if lv >= q_threshold:
            q_timeouts[0] += 1
        return lv

    load_start = quiesce()

    spark = get_spark("bench")

    queries = entry_mod.queries()

    # warm-up: absorb one-time session/JIT/Arrow-worker startup so every
    # per-query number reflects steady-state throughput. One query per
    # execution tier: native codegen aggs, the Arrow/pandas UDF tier
    # (spawns the reusable Python worker pool), a window-function plan,
    # and the document pipeline (shingle explode + multi-join dedup —
    # its first encounter compiles ~10 distinct codegen stages, measured
    # 2-3x the steady-state time if left cold).
    warm = [next(iter(queries))]
    # one per execution tier; sliding_fine_stride carries the two-level
    # pre-aggregation rewrite whose codegen stages are otherwise first
    # encountered mid-measurement (measured 2s warm vs 5-7s cold)
    for cand in (
        "udf_features", "processing_diff", "intersample_stats",
        "sketch_dedup", "sliding_fine_stride",
    ):
        if cand in queries:
            warm.append(cand)
    for w in warm:
        queries[w](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # best-of-N per query: first encounters pay codegen/JIT/GC that
    # steady-state runs don't (±10s swings observed on doc-heavy
    # queries) — the min is the throughput signal, so a regression in
    # BENCH_r{N} is a plan change, not scheduler noise.
    # Rounds are INTERLEAVED (every query once, then every query again):
    # a multi-second host-noise burst then lands on different queries in
    # different rounds instead of poisoning both runs of one query —
    # measured on this shared host, external loadavg spikes with ~95%
    # idle guest CPU inflate whatever happens to be running by 1.3-2x.
    # 5 interleaved rounds (r10, was 3): the shared host's phantom-load
    # bursts inflate whole MINUTES of wall time regardless of loadavg at
    # start (three same-code runs measured 100.2 / 104.2 / 118.9 s
    # totals); with min-of-5 plus the per-round quiescence gate a burst
    # must span five separately-quiesced visits to a query to poison its
    # number. Costs ~4 min of extra bench wall — the price of a durable
    # anchor artifact.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    samples: dict[str, list[float]] = {}
    loads: dict[str, list[float]] = {}
    round_start_load: list[float] = []
    sentinel_sec: list[float] = []
    sentinel_load: list[float] = []

    def _run_sentinel() -> None:
        # min-of-3 back-to-back runs: a single 0.2 s query has ±50 ms of
        # ordinary scheduler jitter that would read as "host drift"; the
        # per-visit MIN isolates the sustained-steal signal the sentinel
        # exists to measure (r9 criterion: cross-round variance < 0.10)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            _sentinel(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        sentinel_sec.append(round(best, 4))
        sentinel_load.append(loadavg())

    # warm the sentinel once too — its first run pays codegen like any
    # other query and would otherwise read as round-1 "drift"
    _run_sentinel()
    sentinel_sec.clear()
    sentinel_load.clear()
    for _round in range(max(1, runs)):
        round_start_load.append(quiesce())
        _run_sentinel()
        for name, fn in queries.items():
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # noop sink executes the full plan without driver collect cost
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            samples.setdefault(name, []).append(el)
            loads.setdefault(name, []).append(loadavg())
            # isolate queries: drop caches + nudge the ContextCleaner so
            # one query's broadcasts don't GC-thrash the next
            spark.catalog.clearCache()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
    # one trailing sentinel sample brackets the window end-to-end
    _run_sentinel()
    # min is the headline (throughput signal — a regression is a plan
    # change, not scheduler noise); the mean rides alongside so the gap
    # between them measures how noisy the window was.
    timings = {k: round(min(v), 4) for k, v in samples.items()}
    means = {k: round(sum(v) / len(v), 4) for k, v in samples.items()}
    sent_var = (
        round((max(sentinel_sec) - min(sentinel_sec)) / min(sentinel_sec), 4)
        if sentinel_sec and min(sentinel_sec) > 0
        else None
    )

    # optional per-gate verification-leg split: __spark_entry__ may expose
    # query_legs() -> {gate: {leg: fn(spark, sf_dir) -> DataFrame}} for
    # the heavy multi-leg verification gates; each leg is timed once
    # (warm) so verdicts can separate engine cost from verification cost
    # mechanically. Legs share upstream plan fragments, so leg times need
    # NOT sum to the gate time — they are a profile, not a partition.
    legs_out: dict[str, dict[str, dict[str, float]]] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_LEGS", "1") != "0" and hasattr(
        entry_mod, "query_legs"
    ):
        for gate, legs in entry_mod.query_legs().items():
            legs_out[gate] = {}
            for leg, fn in legs.items():
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                legs_out[gate][leg] = {
                    "sec": round(time.perf_counter() - t0, 4),
                    "loadavg": loadavg(),
                }
            spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_mean": means,
        "queries_all": {k: [round(x, 4) for x in v] for k, v in samples.items()},
        "queries_loadavg": loads,
        "sentinel_sec": sentinel_sec,
        "sentinel_loadavg": sentinel_load,
        "sentinel_variance": sent_var,
        "verification_legs": legs_out,
        "mean_total_sec": round(sum(means.values()), 4),
        "loadavg_start": load_start,
        "loadavg_end": loadavg(),
        "quiescence": {
            "threshold_load": q_threshold,
            "waited_sec": round(q_waited[0], 1),
            "budget_sec": float(
                os.environ.get("SPARK_GRAFT_BENCH_QUIESCE_SEC", "900")
            ),
            # rounds that STARTED above threshold because the shared wait
            # budget was exhausted — nonzero means the host never went
            # quiet and the headline should be read as an upper bound
            "timed_out_rounds": q_timeouts[0],
            "round_start_loadavg": round_start_load,
        },
        "rounds": max(1, runs),
        "sf": sf_val,
    }
    # Full per-query detail goes to a side file: the driver captures only
    # the LAST ~2000 chars of stdout, and 50 queries x (min + mean) is a
    # >4000-char line that truncated BENCH_r06 into parsed:null. The file
    # keeps everything; stdout ends with one compact (<500 char) summary
    # line so the tail capture always contains parseable JSON.
    side = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    try:
        with open(side, "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass
    compact = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        # per-query seconds in the contract line (r10): rounded to 2dp
        # the 50-entry map is ~1.2k chars, fitting the driver's ~2000-
        # char tail capture alongside the summary fields (the full-
        # precision min/mean/all detail stays in BENCH_FULL.json — the
        # 4dp min+mean variant measured >4000 chars and truncated
        # BENCH_r06 into parsed:null)
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "mean_total_sec": full["mean_total_sec"],
        "sentinel_min": round(min(sentinel_sec), 4) if sentinel_sec else None,
        "sentinel_var": sent_var,
        "quiesce_wait_sec": round(q_waited[0], 1),
        "quiesce_timeouts": q_timeouts[0],
        "rounds": max(1, runs),
        "n_queries": len(timings),
        "detail_file": "BENCH_FULL.json",
        "sf": sf_val,
    }
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
