"""Similarity search + semantic dedup over the embeddings table. Run:
python examples/similarity_search.py [sf_dir]

Brute-force exact top-k as the baseline, a persistable IVF index with
partition-pruned search as the scale path, and SemDeDup over the same
vectors.
"""

import sys
import tempfile

sys.path.insert(0, ".")

from tsflex_spark.datapipe.dedup import semantic_dedup
from tsflex_spark.datapipe.similarity import (
    IVFIndex,
    cosine_topk,
    ivf_train,
    ivf_write,
    ivf_search_parquet,
)
from pyspark.sql import functions as F

from tsflex_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_similarity")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.limit(1).collect()[0]["embedding"]

    exact = cosine_topk(emb, q, k=5)
    print("exact top-5:")
    exact.show()

    with tempfile.TemporaryDirectory() as tmp:
        idx = ivf_train(emb, nlist=8, sample_fraction=0.5)
        idx.save(f"{tmp}/ivf")
        ivf_write(emb, IVFIndex.load(f"{tmp}/ivf"), f"{tmp}/corpus")
        ann = ivf_search_parquet(
            spark, IVFIndex.load(f"{tmp}/ivf"), f"{tmp}/corpus", q, k=5, nprobe=4
        )
        print("IVF top-5 (partition-pruned scan):")
        ann.show()

    kept = semantic_dedup(emb, 0.995, vec_col="embedding", id_col="vec_id")
    print("semantic dedup keeps", kept.count(), "of", emb.count())

    # compression path: PCA to 16 dims, then PQ codes for the ADC scan
    from tsflex_spark.datapipe.embedding import pca_train, pca_transform
    from tsflex_spark.datapipe.similarity import pq_assign, pq_search, pq_train

    model = pca_train(emb, k=16)
    proj = pca_transform(emb, model, out_col="p").select("vec_id", F.col("p").alias("embedding"))
    cb = pq_train(proj, m=4, ksub=32)
    codes = pq_assign(proj, cb).select("vec_id", "pq_code")
    qp = ((__import__("numpy").asarray(q, dtype="float64") - model.mean) @ model.components.T)
    print("PQ/ADC top-5 in PCA space:")
    pq_search(codes, cb, qp, k=5).show()


if __name__ == "__main__":
    main(*sys.argv[1:])
