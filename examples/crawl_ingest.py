"""Crawl → training corpus, end to end. Run:
python examples/crawl_ingest.py [out_dir]

The CommonCrawl-shaped front half of a 100 TB pipeline, at example
scale: WET archives (built here with stdlib gzip — the same bytes a
crawl dump ships) → `read_wet` (one task per archive, streaming
multi-member gunzip) → `clean_corpus` (PII scrub, line rules, quality +
repetition filters, exact + near dedup) → LEAKAGE-SAFE train/val/test
split (near-dup clusters never straddle splits — the Lee et al. 2022
benchmark-contamination guard) → deterministic epoch shuffle → sharded
parquet. Every stage is hash-deterministic; re-running reproduces the
same shards.
"""

import gzip
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from tsflex_spark.datapipe.curation import leakage_safe_split, shuffle_corpus
from tsflex_spark.datapipe.dedup import (
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard,
)
from tsflex_spark.datapipe.pipeline import clean_corpus
from tsflex_spark.session import get_spark


def _record(uri: str, payload: bytes) -> bytes:
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Record-ID: <urn:uuid:{abs(hash(uri))}>\r\n"
        "WARC-Date: 2024-03-01T12:30:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _build_archives(crawl_dir: str) -> None:
    """Two .wet.gz archives: normal pages, a near-dup pair, boilerplate."""
    base = (
        "the quick brown fox jumps over the lazy dog and surveys the "
        "meadow carefully while the evening settles in over the hills"
    )
    pages = {
        "https://a.example/1": base,
        "https://a.example/2": base + " tonight",  # near-dup of /1
        "https://b.example/3": (
            "completely different article text about distributed systems "
            "and the economics of large scale data processing pipelines"
        ),
        "https://b.example/4": "short",  # dropped by quality filters
        "https://c.example/5": (
            "yet another unique document discussing gardening techniques "
            "for arid climates with enough words to pass the filters"
        ),
    }
    items = list(pages.items())
    for i, name in enumerate(["part1.wet.gz", "part2.wet.gz"]):
        with open(f"{crawl_dir}/{name}", "wb") as f:
            for uri, text in items[i * 3 : i * 3 + 3]:
                f.write(gzip.compress(_record(uri, text.encode())))


def main(out_dir: str | None = None) -> None:
    spark = get_spark("example_crawl_ingest")
    out_dir = out_dir or tempfile.mkdtemp(prefix="crawl_shards_")
    crawl_dir = tempfile.mkdtemp(prefix="crawl_in_")
    _build_archives(crawl_dir)

    # 1. ingest: archives -> documents frame (task per archive)
    from tsflex_spark.sources.warc import read_wet

    docs = read_wet(spark, crawl_dir).select(
        F.xxhash64("record_id").alias("doc_id"), "target_uri", "text"
    )

    # 2. clean: quality/repetition filters + exact dedup. Near-dups are
    # deliberately KEPT here (near_dup_threshold=None) — the split below
    # demonstrates the other standard policy: keep them, but never let a
    # cluster straddle train/eval
    cleaned = clean_corpus(
        docs,
        "text",
        "doc_id",
        min_quality_score=0.2,
        near_dup_threshold=None,
    ).localCheckpoint(eager=True)

    # 3. leakage-safe split: near-dup CLUSTERS assign splits, not rows
    sig = minhash_signatures(cleaned, "text", "doc_id", num_hashes=64)
    cand = minhash_lsh_candidates(sig, "doc_id", num_bands=8)
    edges = ngram_jaccard(cleaned, cand, "text", id_col="doc_id").where(
        F.col("jaccard") >= 0.8
    )
    split = leakage_safe_split(
        cleaned, "doc_id", [0.9, 0.05, 0.05], edges=edges.select("id_a", "id_b")
    )

    # 4. deterministic epoch shuffle + sharded write, one dir per split
    for name in ("train", "val", "test"):
        part = split.where(F.col("split") == name).drop("split")
        shuffle_corpus(part, "doc_id", seed=1, num_files=2).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}")

    n = {
        name: spark.read.parquet(f"{out_dir}/{name}").count()
        for name in ("train", "val", "test")
    }
    print(f"shards written to {out_dir}: {n}")


if __name__ == "__main__":
    main(*sys.argv[1:])
