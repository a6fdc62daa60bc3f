"""Scale-linearity probe: replicate the sf0.1 tables Nx (shifted in key /
time / content space so semantics stay honest) and time queries at 1x and
Nx. The question the probe answers is the 100 TB one — does wall time grow
linearly with data, or is something quadratic / spine-bound hiding at test
scale?

Usage:
  python tools/scale_probe.py [factor=10] [sf_dir=/root/testdata/sf0.1]
      — the original fast events-path probe (tumbling + fine-stride).
  python tools/scale_probe.py --gates [factor] [sf_dir] [gate ...]
      — EVERY __spark_entry__ gate at 1x and Nx over a fully replicated
        dataset; prints one JSON line with per-gate {t1, tN, exponent}
        and an alerts list for anything empirically super-linear
        (exponent > 1.25 — O(n log n) lands ≈1.08 at factor 10 — with
        tN > 1s so fixed overhead can't fake an exponent).

Replication keeps per-gate semantics honest at Nx:
- events: ts +k days, user_id/event_id shifted — window/session structure
  per key is preserved, key count scales.
- documents: doc_id shifted by an EVEN span (parity-pair gates keep their
  pair density per replica) and text letter-rotated per replica — intra-
  replica near-dup structure preserved, NO cross-replica near-dups (else
  every replica group becomes a quadratic candidate clique — a data
  artifact, not an algorithm property).
- embeddings: vec_id shifted, vector circular-rotated per replica (norm
  preserved, cross-replica cosine destroyed — same reason).
- orders/lineitem: orderkey shifted consistently (joins scale linearly).
- dims (region..part): copied — the broadcast side does not grow at 100 TB.

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
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tsflex_spark import FeatureCollection, FeatureDescriptor
from tsflex_spark.session import get_spark
from tsflex_spark.sources.io import read_events

_DIMS = ["region", "nation", "customer", "supplier", "part"]
_LETTERS = "etaoinshrd"


def _replicate(spark, sf_dir: str, out_dir: str, factor: int) -> None:
    """Write a factor-x copy of every table under out_dir (parquet dirs)."""
    for t in _DIMS:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )

    def rep(df, transform):
        parts = [transform(df, 0)]
        for k in range(1, factor):
            parts.append(transform(df, k))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rep(
        ev,
        lambda d, k: d.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {k} DAYS"))
        .withColumn("user_id", F.col("user_id") + F.lit(k * 1_000_000))
        .withColumn("event_id", F.col("event_id") + F.lit(k * 1_000_000_000)),
    ).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def doc_t(d, k):
        rot = _LETTERS[k % 10:] + _LETTERS[: k % 10]
        return d.withColumn("doc_id", F.col("doc_id") + F.lit(k * 1_000_000)).withColumn(
            "text", F.translate(F.col("text"), _LETTERS, rot)
        )

    rep(docs, doc_t).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def emb_t(d, k):
        if k == 0:
            return d
        r = k % 63 + 1  # 1..63 — never identity for k>0 at dim 64
        rot = F.concat(
            F.slice(F.col("embedding"), r + 1, 10_000), F.slice(F.col("embedding"), 1, r)
        )
        return d.withColumn("vec_id", F.col("vec_id") + F.lit(k * 1_000_000)).withColumn(
            "embedding", rot
        )

    rep(emb, emb_t).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    for t, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        rep(
            df, lambda d, k, key=key: d.withColumn(key, F.col(key) + F.lit(k * 10_000_000))
        ).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def _stages(spark) -> list:
    """Completed-stage metrics via the status REST API (needs
    SPARK_GRAFT_UI=true; returns [] when the UI is off)."""
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return []
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages", timeout=10
        ) as r:
            return _json.load(r)
    except Exception:
        return []


def _shuffle_delta(spark, before_keys: set) -> tuple[dict, set]:
    """Sum + peak shuffle bytes over stages not in ``before_keys``."""
    stages = _stages(spark)
    keys = {(s["stageId"], s["attemptId"]) for s in stages}
    new = [s for s in stages if (s["stageId"], s["attemptId"]) not in before_keys]
    return (
        {
            "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in new),
            "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in new),
            "peak_stage_shuffle_write": max(
                (s.get("shuffleWriteBytes", 0) for s in new), default=0
            ),
            "n_stages": len(new),
        },
        keys,
    )


def gates_main() -> None:
    args = [a for a in sys.argv[2:]]
    factor = int(args[0]) if args and args[0].isdigit() else 10
    rest = args[1:] if args and args[0].isdigit() else args
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    only = set(rest[1:] if rest and os.path.isdir(rest[0]) else rest)

    import __spark_entry__ as entry_mod

    spark = get_spark("scale_probe_gates")
    base = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/scale_probe")
    d1, dn = f"{base}/1x", f"{base}/{factor}x"
    # SPARK_GRAFT_PROBE_REUSE=1 skips re-replication when the copies are
    # already on disk (resuming an interrupted probe run)
    reuse = os.environ.get("SPARK_GRAFT_PROBE_REUSE") == "1"
    if not (reuse and os.path.isdir(f"{d1}/events.parquet")):
        _replicate(spark, sf_dir, d1, 1)
    if not (reuse and os.path.isdir(f"{dn}/events.parquet")):
        _replicate(spark, sf_dir, dn, factor)

    queries = entry_mod.queries()
    if only:
        queries = {k: v for k, v in queries.items() if k in only}

    # warm the tiers once so first-encounter codegen/Arrow-worker startup
    # doesn't land inside a measured 1x number
    for w in list(queries)[:1] + [
        q for q in ("udf_features", "sketch_dedup", "processing_diff") if q in queries
    ]:
        queries[w](spark, d1).write.format("noop").mode("overwrite").save()

    results: dict[str, dict] = {}
    alerts: list[str] = []
    seen_stages: set = {
        (s["stageId"], s["attemptId"]) for s in _stages(spark)
    }
    for name, fn in queries.items():
        row: dict = {}
        for tag, d in (("t1", d1), ("tN", dn)):
            t0 = time.perf_counter()
            try:
                fn(spark, d).write.format("noop").mode("overwrite").save()
                row[tag] = round(time.perf_counter() - t0, 2)
            except Exception as e:
                row[tag] = None
                row["err"] = str(e)[:200]
            sh, seen_stages = _shuffle_delta(spark, seen_stages)
            if sh["n_stages"]:
                row[f"shuffle_{tag}"] = sh
            spark.catalog.clearCache()
            # GC nudge between gates (same isolation as bench.py): the r6
            # all-50 run showed late-session gates inflated 2-4x by
            # accumulated executor GC pressure — r7 targeted re-probes of
            # the same gates measured exponents 0.25-0.43 vs the recorded
            # 0.57-0.66 (NOTES_DEV "Round-7 probe re-measurement")
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        if row.get("t1") and row.get("tN"):
            row["exponent"] = round(
                math.log(max(row["tN"], 1e-3) / max(row["t1"], 1e-3)) / math.log(factor), 3
            )
            if row["exponent"] > 1.25 and row["tN"] > 1.0:
                alerts.append(f"{name}: x{factor} exponent {row['exponent']}")
        results[name] = row
        print(f"# {name}: 1x={row.get('t1')}s {factor}x={row.get('tN')}s "
              f"exp={row.get('exponent')}", file=sys.stderr)
    print(json.dumps({"factor": factor, "gates": results, "alerts": alerts}))
    spark.stop()


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
    if len(sys.argv) > 1 and sys.argv[1] == "--gates":
        gates_main()
    else:
        main()
