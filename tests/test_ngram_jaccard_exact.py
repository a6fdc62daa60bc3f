"""ngram_jaccard value-exactness vs an independent python-set brute force.

The r11 rewrite computes pair intersections in-row over per-doc shingle
ARRAYS (collect_list + array_intersect) instead of pair-driven
(id, shingle) equi-joins — ~10x fewer shuffle bytes at the 100x probe.
This pins the CONTRACT the rewrite must keep: identical jaccard doubles
for every pair, including the j=1 (identical docs), j=0 (disjoint), and
partial-overlap cases, under both prune modes and the shingles= reuse
path.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsflex_spark.datapipe.dedup import ngram_jaccard, shingle_rows

K = 5

DOCS = {
    0: "the quick brown fox jumps over the lazy dog",
    1: "the quick brown fox jumps over the lazy dog",  # identical to 0
    2: "numbers 123 456 789 and totally unrelated words",  # disjoint-ish
    3: "the quick brown fox sleeps under the lazy dog",  # partial overlap
    4: "zz",  # shorter than k -> single truncated shingle
}
PAIRS = [(0, 1), (0, 2), (0, 3), (2, 3), (0, 4)]


def _brute_jaccard(a: str, b: str) -> float:
    def sh(t: str) -> set:
        n = " ".join(t.lower().split())
        return {n[i : i + K] for i in range(max(len(n) - K + 1, 1))}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


@pytest.mark.parametrize("prune", [True, False])
def test_values_match_brute_force(spark, prune):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(DOCS), "text": list(DOCS.values())})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame(PAIRS, columns=["id_a", "id_b"])
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard(
            df, pairs, "text", id_col="doc_id", shingle_k=K, prune=prune
        ).collect()
    }
    assert set(got) == set(PAIRS)
    for a, b in PAIRS:
        exp = _brute_jaccard(DOCS[a], DOCS[b])
        assert got[(a, b)] == pytest.approx(exp, abs=0.0), (a, b)
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] < 0.05


def test_shingles_reuse_path_identical(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(DOCS), "text": list(DOCS.values())})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame(PAIRS, columns=["id_a", "id_b"])
    )
    sh = shingle_rows(df, "text", "doc_id", K).localCheckpoint(eager=True)
    inline = ngram_jaccard(df, pairs, "text", id_col="doc_id", shingle_k=K)
    reused = ngram_jaccard(
        df, pairs, "text", id_col="doc_id", shingle_k=K, shingles=sh
    )
    gi = {(r["id_a"], r["id_b"]): r["jaccard"] for r in inline.collect()}
    gr = {(r["id_a"], r["id_b"]): r["jaccard"] for r in reused.collect()}
    assert gi == gr


def test_pair_id_missing_from_corpus_dropped(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": [DOCS[0], DOCS[1]]})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame([(0, 1), (0, 99)], columns=["id_a", "id_b"])
    )
    out = ngram_jaccard(df, pairs, "text", id_col="doc_id", shingle_k=K)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # a pair whose id has no shingle rows yields no row (inner-join
    # semantics, unchanged from the equi-join shape)
    assert got == {(0, 1)}
