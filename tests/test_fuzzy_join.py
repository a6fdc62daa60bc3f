"""Cross-table fuzzy join: exact-method oracle vs a python Jaccard,
LSH-method agreement on clear matches, threshold filtering, id-space
independence."""

import pytest

from tsflex_spark.datapipe.dedup import fuzzy_join

LEFT = [
    (1, "apple iphone 15 pro max 256gb space black smartphone"),
    (2, "samsung galaxy s24 ultra 512gb titanium gray phone"),
    (3, "sony wh-1000xm5 wireless noise canceling headphones"),
    (4, "completely unrelated garden hose twenty five feet"),
]
RIGHT = [
    (1, "apple iphone 15 pro max 256gb space black smart phone"),      # ~ L1
    (2, "sony wh-1000xm5 wireless noise cancelling headphones"),       # ~ L3
    (3, "dell xps 13 laptop 16gb ram oled display"),                   # none
]


def _shingles(text, k=5):
    norm = " ".join(text.split()).lower()
    if len(norm) <= k:
        return {norm}
    return {norm[i : i + k] for i in range(len(norm) - k + 1)}


def _ref_jaccard(a, b, k=5):
    sa, sb = _shingles(a, k), _shingles(b, k)
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def frames(spark):
    l = spark.createDataFrame(LEFT, "lid long, text string")
    r = spark.createDataFrame(RIGHT, "rid long, text string")
    return l, r


def test_exact_method_matches_python_oracle(spark, frames):
    l, r = frames
    out = fuzzy_join(
        l, r, "text", "lid", "rid", threshold=0.0, method="exact"
    ).collect()
    got = {(x["lid"], x["rid"]): x["jaccard"] for x in out}
    for li, lt in LEFT:
        for ri, rt in RIGHT:
            ref = _ref_jaccard(lt, rt)
            if ref > 0:
                assert got[(li, ri)] == pytest.approx(ref, rel=1e-9), (li, ri)
            else:
                assert (li, ri) not in got


def test_threshold_filters(spark, frames):
    l, r = frames
    out = fuzzy_join(
        l, r, "text", "lid", "rid", threshold=0.7, method="exact"
    ).collect()
    pairs = {(x["lid"], x["rid"]) for x in out}
    assert pairs == {(1, 1), (3, 2)}


def test_lsh_agrees_on_clear_matches(spark, frames):
    l, r = frames
    out = fuzzy_join(
        l, r, "text", "lid", "rid", threshold=0.7, method="lsh"
    ).collect()
    pairs = {(x["lid"], x["rid"]) for x in out}
    assert pairs == {(1, 1), (3, 2)}
    # scores identical to the exact method for surviving pairs
    exact = {
        (x["lid"], x["rid"]): x["jaccard"]
        for x in fuzzy_join(
            l, r, "text", "lid", "rid", threshold=0.7, method="exact"
        ).collect()
    }
    for x in out:
        assert x["jaccard"] == pytest.approx(exact[(x["lid"], x["rid"])], rel=1e-12)


def test_id_spaces_independent(spark):
    # both tables use id=1 for different content — no cross-talk
    l = spark.createDataFrame([(1, "alpha beta gamma delta epsilon")], "lid long, text string")
    r = spark.createDataFrame([(1, "zeta eta theta iota kappa lambda")], "rid long, text string")
    out = fuzzy_join(l, r, "text", "lid", "rid", threshold=0.1, method="exact")
    assert out.count() == 0


def test_unknown_method_raises(spark, frames):
    l, r = frames
    with pytest.raises(ValueError):
        fuzzy_join(l, r, "text", "lid", "rid", method="nope")


def _lev(a: str, b: str) -> int:
    # textbook unit-cost DP oracle
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_similarity_python_oracle(spark):
    from tsflex_spark.datapipe.dedup import edit_similarity

    docs = spark.createDataFrame(
        [(1, "kitten in the yard"), (2, "sitting in the yard"),
         (3, "Kitten  IN the\tyard"), (4, "")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 4)], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in edit_similarity(pairs, docs, "text", "doc_id").collect()
    }
    norm = {1: "kitten in the yard", 2: "sitting in the yard",
            3: "kitten in the yard", 4: ""}
    for (a, b), r in out.items():
        d = _lev(norm[a], norm[b])
        mx = max(len(norm[a]), len(norm[b]))
        assert r["edit_dist"] == d
        exp = 1.0 if mx == 0 else 1.0 - d / mx
        assert r["edit_sim"] == exp
    # normalization: case + whitespace collapse make 1 vs 3 identical
    assert out[(1, 3)]["edit_dist"] == 0 and out[(1, 3)]["edit_sim"] == 1.0
    # empty-vs-empty: defined as similarity 1, not 0/0
    assert out[(4, 4)]["edit_sim"] == 1.0


def test_edit_similarity_prefix_bound(spark):
    from tsflex_spark.datapipe.dedup import edit_similarity

    long_a = "x" * 500
    long_b = "x" * 300 + "y" * 200
    docs = spark.createDataFrame(
        [(1, long_a), (2, long_b)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = edit_similarity(pairs, docs, "text", "doc_id", prefix_len=256).collect()[0]
    # only the first 256 chars enter the DP: 300 shared 'x' -> prefix equal
    assert r["edit_dist"] == 0
    r2 = edit_similarity(pairs, docs, "text", "doc_id", prefix_len=None).collect()[0]
    assert r2["edit_dist"] == 200
