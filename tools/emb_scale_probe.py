"""Scale-linearity probe for the embedding pipeline: replicate the sf0.1
embeddings table Nx and time SemDeDup (cell assignment + within-cell
GEMM pairs + CC keep-one), exact knn_join, and brute cosine top-k at 1x
and Nx.

Replication honesty: each replica CYCLICALLY ROTATES the embedding
coordinates by k positions. A coordinate permutation preserves every
within-replica pairwise cosine exactly (the duplicate structure scales
with the data) while cross-replica cosines decorrelate — replicas do
not near-dup each other. (A first attempt added a per-replica constant
to one axis; that makes all vectors in a replica near-parallel and
manufactures a quadratic pair count — 3 s -> 268 s at 10x, entirely a
probe artifact.) The IVF quantizer is trained ONCE on the 1x table and
reused at Nx (the production shape: a fixed index, growing corpus).

Usage: python tools/emb_scale_probe.py [factor=10] [sf_dir=/root/testdata/sf0.1]
Prints one JSON line: {"rows_1x": ..., "rows_Nx": ..., "timings": {...}}

Findings recorded from the 2026-08 run (local[32], factor 10,
2k -> 20k vectors, 64 IVF cells, threshold 0.8, warm):
- semantic_dedup 0.89 -> 1.08 s, knn_join(50 queries, k=10)
  0.36 -> 0.39 s, cosine_topk 0.45 -> 0.61 s — all far sub-linear at
  this size (fixed job overhead dominates); no quadratic blowup from
  the within-cell GEMM. At real scale the m² term is (n/nlist)² per
  cell — kept flat in production by scaling nlist with n.
- embedding-toolbox ops (2026-08 second run, same replication):
  pca_train(k=16) 0.22 -> 0.48 s, full-rank train+transform
  0.44 -> 0.66 s, kmeans_fit(k=16, 5 iters) 1.09 -> 1.74 s,
  pq_assign(m=8) 0.22 -> 0.34 s at 2k -> 20k vectors — all sub-linear;
  the moment/partial reductions stay O(partitions) on the driver.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tsflex_spark.session import get_spark


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("emb_scale_probe")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    dim0 = len(emb.select("embedding").first()[0])
    big = emb
    for k in range(1, factor):
        rot = (k * 7) % dim0 or 1  # spread rotations across the dims
        big = big.unionByName(
            emb.select(
                (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                F.concat(
                    F.slice(F.col("embedding"), rot + 1, dim0 - rot),
                    F.slice(F.col("embedding"), 1, rot),
                ).alias("embedding"),
            )
        )
    small = emb.localCheckpoint(eager=True)
    big = big.localCheckpoint(eager=True)
    rows = {"rows_1x": small.count(), "rows_Nx": big.count()}

    from tsflex_spark.datapipe.dedup import semantic_dedup
    from tsflex_spark.datapipe.similarity import cosine_topk, ivf_train, knn_join

    index = ivf_train(small, nlist=64)
    queries = small.limit(50).select(
        F.col("vec_id").alias("q_id"), "embedding"
    ).localCheckpoint(eager=True)
    qvec = [1.0] + [0.0] * (dim0 - 1)

    from tsflex_spark.datapipe.embedding import kmeans_fit, pca_train, pca_transform
    from tsflex_spark.datapipe.similarity import pq_assign, pq_train

    cb = pq_train(small, m=8, ksub=64)  # codebooks fixed, corpus grows

    def run(df):
        out = {}
        t0 = time.perf_counter()
        semantic_dedup(df, 0.8, index=index).write.format("noop").mode(
            "overwrite"
        ).save()
        out["semantic_dedup"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        knn_join(df, queries, k=10).write.format("noop").mode("overwrite").save()
        out["knn_join"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        cosine_topk(df, qvec, k=10).write.format("noop").mode("overwrite").save()
        out["cosine_topk"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        pca_train(df, k=16)
        out["pca_train"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        model = pca_train(df, k=dim0)
        pca_transform(df, model).write.format("noop").mode("overwrite").save()
        out["pca_train_transform_full"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        kmeans_fit(df, k=16, iters=5)
        out["kmeans_5it"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        pq_assign(df, cb).write.format("noop").mode("overwrite").save()
        out["pq_assign"] = round(time.perf_counter() - t0, 2)
        return out

    run(small)  # warm-up: absorb codegen/JIT/Arrow-worker startup
    timings = {"1x": run(small), f"{factor}x": run(big)}
    print(json.dumps({**rows, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
