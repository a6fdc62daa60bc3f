"""Deduplication operators for large-scale document pipelines.

All operators are pure DataFrame transforms designed for 100 TB inputs:
- exact dedup: one hash-shuffle groupBy on a 64-bit content hash (never
  shuffles the full text as the key);
- MinHash + LSH near-dup: shingle → minhash signature → band buckets →
  self-join within buckets (the classic band/bucket equi-join — candidate
  pairs only, no O(n²) comparison);
- SimHash: 64-bit fingerprint, hamming-band buckets;
- n-gram Jaccard verification on candidate pairs.

Hashes use Spark's built-in ``xxhash64`` (JVM-side, codegen) so the hot
path never enters Python.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, cols: Sequence[str] | str, id_col: Optional[str] = None) -> DataFrame:
    """Drop exact duplicates over ``cols``; keep the row with min ``id_col``
    (deterministic) or an arbitrary row when no id is given."""
    if isinstance(cols, str):
        cols = [cols]
    if id_col is None:
        return df.dropDuplicates(list(cols))
    h = F.xxhash64(*[F.col(c) for c in cols])
    keep = df.groupBy(h.alias("__h")).agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")


def dedup_exact_stats(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Per duplicate-group stats: kept id + copy count (oracle-friendly)."""
    return (
        df.groupBy(col)
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    )


# ---------------------------------------------------------------- MinHash
def _shingles(col: Column, k: int) -> Column:
    """Character k-shingle set of a (lowercased, whitespace-normalized) text."""
    norm = F.lower(F.regexp_replace(col, r"\s+", " "))
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(k))))


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, minhash array<long>) — one JVM-side pass, no Python.

    minhash_j(doc) = min over shingles of xxhash64(shingle, seed_j).
    """
    sh = df.select(F.col(id_col), _shingles(F.col(text_col), shingle_k).alias("__sh"))
    mins = F.array(
        *[
            F.array_min(
                F.transform(F.col("__sh"), lambda s: F.xxhash64(s, F.lit(seed + j)))
            ).alias(f"h{j}")
            for j in range(num_hashes)
        ]
    )
    return sh.select(F.col(id_col), mins.alias("minhash"))


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str,
    num_bands: int = 16,
) -> DataFrame:
    """LSH banding: equal band-hash ⇒ candidate pair (id_a < id_b).

    Scale path: explode to (band, band_hash) — an equi-join self-join keyed
    on the band bucket; only colliding docs ever meet.
    """
    bands = signatures.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(
                        F.col("minhash"),
                        b * (F.size(F.col("minhash")) / num_bands).cast("int") + 1,
                        (F.size(F.col("minhash")) / num_bands).cast("int"),
                    ).cast("string")
                ),
            )
        ).alias("band", "band_hash"),
    )
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    pairs = a.join(b, on=["band", "band_hash"]).where(F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b").distinct()


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 5,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification stage)."""
    sh = df.select(F.col(id_col), _shingles(F.col(text_col), shingle_k).alias("__sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    num_bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Near-dup removal: LSH candidates → exact Jaccard ≥ threshold →
    connected-ish grouping (min-id representative) → keep representatives.

    Representative choice: each doc maps to the min id among its confirmed
    near-dups (single-hop union — documents chained A~B~C keep min per
    edge-closure hop; sufficient for dedup filtering semantics)."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    cands = minhash_lsh_candidates(sigs, id_col, num_bands)
    confirmed = ngram_jaccard(df, cands, text_col, id_col, shingle_k).where(
        F.col("jaccard") >= threshold
    )
    # drop the higher id of every confirmed pair
    losers = confirmed.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------- SimHash
def simhash(df: DataFrame, text_col: str, id_col: str, shingle_k: int = 5) -> DataFrame:
    """64-bit SimHash fingerprint per document — JVM-side only.

    For each bit b: sign(sum over shingles of ±1 by shingle-hash bit b).
    """
    sh = df.select(F.col(id_col), _shingles(F.col(text_col), shingle_k).alias("__sh"))
    # materialize the shingle-hash array once; the 64 per-bit aggregates
    # then fold over it without re-hashing (bit index must be a Python int
    # for shiftright, so the bits are unrolled driver-side)
    hashed = sh.withColumn("__h", F.transform(F.col("__sh"), lambda s: F.xxhash64(s)))
    def _bit_merge(b: int):
        # NB: must be a 2-arg lambda — pyspark binds one lambda variable per
        # parameter, so a defaulted 3rd arg would receive a Column
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    fingerprint = F.lit(0).cast("long")
    for b in range(64):
        bit_sum = F.aggregate(F.col("__h"), F.lit(0).cast("long"), _bit_merge(b))
        mask = F.lit(-(2**63) if b == 63 else (1 << b)).cast("long")
        fingerprint = fingerprint.bitwiseOR(
            F.when(bit_sum > 0, mask).otherwise(F.lit(0).cast("long"))
        )
    return hashed.select(F.col(id_col), fingerprint.alias("simhash"))
