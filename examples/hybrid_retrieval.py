"""Hybrid retrieval: BM25 candidate generation → dense cosine re-rank.

The standard two-stage retrieval shape over the driver tables:
``documents`` supplies the lexical signal (inverted-index BM25),
``embeddings`` the dense one (exact cosine over the candidate set only —
the expensive similarity never touches the full corpus).

Run: python examples/hybrid_retrieval.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from tsflex_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from tsflex_spark.datapipe.retrieval import (
        bm25_topk,
        build_postings,
        corpus_size_and_avgdl,
    )
    from tsflex_spark.datapipe.similarity import cosine_similarity_col

    spark = get_spark("example_hybrid_retrieval")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    query = "fast table scan"
    # stage 1: lexical candidates (one corpus scan, TakeOrdered top-50)
    cands = bm25_topk(docs, query, k=50)
    print("BM25 candidates:")
    cands.show(5)

    # stage 2: dense re-rank of ONLY the candidates (query embedding =
    # vec_id 0 stands in for an encoded query vector)
    qv = emb.where(F.col("vec_id") == 0).first()["embedding"]
    reranked = (
        cands.join(emb, cands.doc_id == emb.vec_id)
        .select(
            "doc_id",
            "bm25",
            cosine_similarity_col(F.col("embedding"), qv).alias("cosine"),
        )
        .withColumn("hybrid", 0.3 * F.col("bm25") + 0.7 * F.col("cosine"))
        .orderBy(F.col("hybrid").desc())
    )
    print("hybrid top-10 (0.3·bm25 + 0.7·cosine):")
    reranked.show(10)

    # batch shape: the same two stages for many queries at once
    queries = spark.createDataFrame(
        [(0, "fast table scan"), (1, "stream window agg")], ["q_id", "q_text"]
    )
    postings = build_postings(docs)
    n, avgdl = corpus_size_and_avgdl(docs)
    from tsflex_spark.datapipe.retrieval import bm25_join

    batch = bm25_join(queries, postings, n_docs=n, avgdl=avgdl, k=5)
    print("batch BM25 (2 queries × top-5):")
    batch.orderBy("q_id", "rank").show()


if __name__ == "__main__":
    main(*sys.argv[1:])
