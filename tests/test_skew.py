"""Skew-mitigation helpers: join parity (rows AND duplicates) against
plain joins on skewed data, differential salting cost shape, the
two-level collect_list, and the diagnostic."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from tsflex_spark.utils.skew import (
    approx_heavy_hitters,
    key_skew_stats,
    salted_collect_list,
    salted_join,
    salted_join_hot,
)


def _skewed(spark):
    """90% of the big side lands on key 1; small side has 1 row/key."""
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    return big, small


def _rows(df):
    return Counter(tuple(r) for r in df.collect())


def test_salted_join_inner_parity(spark):
    big, small = _skewed(spark)
    want = _rows(big.join(small, on=["k"], how="inner").select("k", "v", "w"))
    got = _rows(salted_join(big, small, on=["k"], buckets=8).select("k", "v", "w"))
    assert got == want and len(want) > 0


def test_salted_join_left_parity_with_unmatched(spark):
    big, small = _skewed(spark)
    small2 = small.filter(F.col("k") != 1)  # hot key now unmatched
    want = _rows(big.join(small2, on=["k"], how="left").select("k", "v", "w"))
    got = _rows(salted_join(big, small2, on=["k"], how="left", buckets=8).select("k", "v", "w"))
    assert got == want
    with pytest.raises(ValueError):
        salted_join(big, small, on=["k"], how="full")


def test_salted_join_hot_parity_and_small_side_cost(spark):
    big, small = _skewed(spark)
    want = _rows(big.join(small, on=["k"], how="inner").select("k", "v", "w"))
    got = _rows(
        salted_join_hot(big, small, on=["k"], hot_keys=[1], buckets=16).select(
            "k", "v", "w"
        )
    )
    assert got == want
    # empty hot list degenerates to the plain join
    got2 = _rows(
        salted_join_hot(big, small, on=["k"], hot_keys=[], buckets=16).select(
            "k", "v", "w"
        )
    )
    assert got2 == want


def test_salted_join_hot_composite_keys(spark):
    big = spark.createDataFrame(
        [(1, "a", i) for i in range(50)] + [(2, "b", 1), (3, "c", 2)],
        "k1 long, k2 string, v long",
    )
    small = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200), (9, "z", 900)],
        "k1 long, k2 string, w long",
    )
    want = _rows(big.join(small, on=["k1", "k2"], how="inner"))
    got = _rows(
        salted_join_hot(
            big, small, on=["k1", "k2"], hot_keys=[(1, "a")], buckets=4
        )
    )
    assert got == want


def test_salted_collect_list_same_multiset(spark):
    big, _ = _skewed(spark)
    plain = {
        r["k"]: Counter(r["lst"])
        for r in big.groupBy("k").agg(F.collect_list("v").alias("lst")).collect()
    }
    salted = {
        r["k"]: Counter(r["v_list"])
        for r in salted_collect_list(big, ["k"], "v", buckets=8).collect()
    }
    assert salted == plain


def test_key_skew_stats_finds_hot_key(spark):
    big, _ = _skewed(spark)
    top = key_skew_stats(big, ["k"], top=3).collect()
    assert top[0]["k"] == 1
    assert top[0]["rows"] == 902  # 900 direct + ids 901, 951 via id % 50
    assert top[0]["share"] == pytest.approx(0.902)


def test_salted_join_splits_hot_key_partitions(spark):
    """The point of the exercise: after salting, no single (key, salt)
    group carries the whole hot key."""
    big, small = _skewed(spark)
    from tsflex_spark.utils.skew import _SALT, _salt_col

    salted = big.withColumn(_SALT, _salt_col(big, 8))
    per_bucket = (
        salted.filter(F.col("k") == 1).groupBy(_SALT).count().collect()
    )
    assert len(per_bucket) == 8  # hot key scattered over all buckets
    assert max(r["count"] for r in per_bucket) < 902


def test_approx_heavy_hitters_finds_hot_key(spark):
    big, _ = _skewed(spark)
    cand = approx_heavy_hitters(big, ["k"], support=0.3)
    vals = {r["k"] for r in cand.collect()}
    assert 1 in vals  # no false negatives above support
    # and the candidates feed the differential-salting path
    small = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    want = _rows(big.join(small, on=["k"], how="inner").select("k", "v", "w"))
    got = _rows(
        salted_join_hot(big, small, on=["k"], hot_keys=sorted(vals), buckets=8).select(
            "k", "v", "w"
        )
    )
    assert got == want
