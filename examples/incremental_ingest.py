"""Continuous ingestion: dedup each arriving batch against everything
ever accepted. Run:
python examples/incremental_ingest.py [sf_dir]

The back half of a live crawl pipeline: a PERSISTENT band store (parquet,
partitioned by band, 8-byte hashes — never text) remembers every accepted
document's LSH bands; each new batch is (1) dropped on any band collision
with the store, (2) near-dup deduped within itself, (3) appended. One
sketch pass per batch feeds both steps via the ``signatures=`` reuse
contract. State grows with ACCEPTED docs × num_bands rows — at 100 TB the
store stays a tiny fraction of the corpus and the membership check is a
band-partitioned equi-join.

The same call drops into ``foreachBatch`` for Structured Streaming — the
signature pass is per-batch, the store join is a batch join.
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from tsflex_spark.datapipe.dedup import (
    dedup_against_store,
    minhash_signatures,
    shingle_rows,
)
from tsflex_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_incremental")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store = tempfile.mkdtemp(prefix="band_store_") + "/store"

    # simulate three crawl batches arriving over time
    batches = [docs.where(F.pmod(F.col("doc_id"), F.lit(3)) == i) for i in range(3)]

    total_in = total_kept = 0
    for i, batch in enumerate(batches):
        # one sketch pass per batch, shared by the store check AND the
        # within-batch dedup (signatures= reuse)
        sig = minhash_signatures(
            batch, "text", "doc_id", num_hashes=64,
            shingles=shingle_rows(batch, "text", "doc_id"),
        ).localCheckpoint(eager=True)
        kept = dedup_against_store(
            batch, store, "text", "doc_id",
            num_hashes=64, num_bands=16, signatures=sig,
        )
        n_in, n_kept = batch.count(), kept.count()
        total_in += n_in
        total_kept += n_kept
        print(f"batch {i}: {n_in} in -> {n_kept} accepted")

    n_store = spark.read.parquet(store).count()
    print(
        f"total: {total_in} in -> {total_kept} accepted; "
        f"store holds {n_store} band rows ({n_store // 16} docs x 16 bands)"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
