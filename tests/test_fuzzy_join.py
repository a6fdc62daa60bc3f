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
