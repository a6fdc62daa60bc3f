"""End-to-end pre-training data preparation. Run:
python examples/pretraining_data.py [sf_dir] [out_dir]

The full curation path a 100 TB pipeline runs, at example scale:
line-wise cleaning + doc filters + dedup (clean_corpus) → CCNet
perplexity bucketing, keep head+middle → temperature-scaled source
rebalancing → deterministic epoch shuffle → context-window chunking →
sequence packing → sharded parquet. Every stage is hash-deterministic:
re-running produces byte-identical shards.
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from tsflex_spark.datapipe.curation import shuffle_corpus, temperature_mix
from tsflex_spark.datapipe.lm import ppl_buckets, train_ngram_lm
from tsflex_spark.datapipe.pipeline import clean_corpus
from tsflex_spark.datapipe.bpe import bpe_encode, train_bpe
from tsflex_spark.datapipe.text import (
    chunk_documents,
    materialize_packed,
    pack_sequences,
)
from tsflex_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001", out_dir: str | None = None) -> None:
    spark = get_spark("example_pretraining")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. clean: line-wise boilerplate, quality/repetition filters, dedup
    cleaned = clean_corpus(
        docs,
        "text",
        "doc_id",
        min_quality_score=0.2,
        near_dup_threshold=0.8,
        line_filter={"min_chars": 3},
    )

    # 2. CCNet bucketing: LM trained on the cleaned corpus itself here;
    # production trains on a curated reference (e.g. Wikipedia)
    lm = train_ngram_lm(cleaned, "text")
    bucketed = ppl_buckets(cleaned, lm, "text")
    kept = bucketed.where(
        F.col("ppl_bucket").isin("head", "middle") | F.col("ppl_bucket").isNull()
    )

    # 3. flatten source skew (alpha<1 boosts small sources). Checkpoint:
    # the cleaned+scored+mixed frame feeds several actions below — without
    # the lineage cut each one re-runs the whole curation DAG
    mixed = temperature_mix(kept, "source", "doc_id", alpha=0.7).localCheckpoint(
        eager=True
    )

    # 4. deterministic epoch shuffle, then context windows + packing
    shuffled = shuffle_corpus(mixed, "doc_id", seed=0)
    chunks = chunk_documents(shuffled, "text", "doc_id", max_tokens=64).localCheckpoint(
        eager=True
    )
    packed = pack_sequences(chunks, "n_chunk_tokens", budget=256)

    # 5. tokenize (BPE trained on the corpus) + materialize fixed-length
    # training sequences: ids + EOS per chunk, concat per bin, pad, and
    # the position->doc segment map packed attention needs
    tok = train_bpe(mixed, "text", num_merges=150)
    # chunk_id is per-doc; synthesize a globally-unique chunk key for the
    # encode join and the deterministic within-bin order
    packed = packed.withColumn("cuid", F.xxhash64("doc_id", "chunk_id"))
    ids = bpe_encode(packed, "chunk_text", "cuid", tok, ids=True)
    with_ids = packed.select("cuid", "bin_id").join(ids, "cuid")
    eos = len(tok.vocab)
    seqs = materialize_packed(
        with_ids, "tokens", order_col="cuid", seq_len=320, eos_id=eos
    )

    out = out_dir or tempfile.mkdtemp(prefix="pretraining_shards_")
    # token sequences ship as parquet (arrays of ints); the cleaned TEXT
    # corpus also exports as gzip JSONL — the interchange format most
    # downstream training stacks ingest
    from tsflex_spark.sources.io import write_jsonl

    write_jsonl(mixed.select("doc_id", "source", "text"), f"{out}_text_jsonl", num_files=2)
    shuffle_corpus(seqs, "bin_id", seed=0, num_files=4).write.mode(
        "overwrite"
    ).parquet(out)

    n_docs, n_chunks = mixed.count(), chunks.count()
    n_bins = seqs.count()
    print(f"docs kept {n_docs}, chunks {n_chunks}, packed sequences {n_bins} -> {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
