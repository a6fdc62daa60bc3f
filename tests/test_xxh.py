"""Bit-parity of the pure-Python XXH64 against Catalyst's xxhash64 —
the contract that makes in-closure bucket assignments engine-exact."""

import pytest
from pyspark.sql import functions as F

from tsflex_spark.utils.xxh import hash_bytes, spark_xxhash64

CASES = [
    "", "a", "abc", "hell", "hello world", "x" * 7, "y" * 8, "z" * 31,
    "w" * 32, "q" * 33, "m" * 100, "üñïçødé ✓", "tab\tnl\nspace end ",
]


def test_string_parity(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string").select(
        "s",
        F.xxhash64("s").alias("h1"),
        F.xxhash64("s", F.lit(1)).alias("h2"),
        F.xxhash64(F.lit(7), "s").alias("h3"),
        F.xxhash64("s", "s").alias("h4"),
    )
    for r in df.collect():
        assert spark_xxhash64(r["s"]) == r["h1"]
        assert spark_xxhash64(r["s"], 1) == r["h2"]
        assert spark_xxhash64(7, r["s"]) == r["h3"]
        assert spark_xxhash64(r["s"], r["s"]) == r["h4"]


def test_long_and_int_parity(spark):
    vals = [0, 1, -1, 41, 2**40, -(2**40), 2**62, -(2**63)]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v", F.xxhash64("v").alias("hl")
    )
    for r in df.collect():
        assert spark_xxhash64(("long", r["v"])) == r["hl"]
    ints = [0, 1, -1, 2**31 - 1, -(2**31)]
    df2 = spark.createDataFrame([(v,) for v in ints], "v int").select(
        "v", F.xxhash64("v").alias("hi")
    )
    for r in df2.collect():
        assert spark_xxhash64(int(r["v"])) == r["hi"]


def test_binary_parity(spark):
    blobs = [b"", b"\x00", b"\xff" * 40, bytes(range(256))]
    df = spark.createDataFrame([(b,) for b in blobs], "b binary").select(
        "b", F.xxhash64("b").alias("h")
    )
    for r in df.collect():
        assert spark_xxhash64(bytes(r["b"])) == r["h"]


def test_reference_vector(spark):
    # the canonical xxhash64 test vector: XXH64("", seed=0) is published
    # as 0xEF46DB3751D8E999
    assert hash_bytes(b"", 0) == 0xEF46DB3751D8E999


def test_unsupported_type_raises():
    with pytest.raises(TypeError):
        spark_xxhash64(1.5)


def test_randomized_string_parity(spark):
    """200 random strings (lengths 0-200, unicode mixed in) in one
    batched comparison — the fuzz pass over the stripe/tail paths."""
    import random

    rnd = random.Random(99)
    alphabet = "abcdefghijklmnopqrstuvwxyz 0123456789!@#üñß漢字✓\t\n"
    cases = [
        "".join(rnd.choice(alphabet) for _ in range(rnd.randrange(0, 200)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(s,) for s in cases], "s string").select(
        "s", F.xxhash64("s").alias("h"), F.xxhash64("s", F.lit(3)).alias("h3")
    )
    for r in df.collect():
        assert spark_xxhash64(r["s"]) == r["h"], repr(r["s"])
        assert spark_xxhash64(r["s"], 3) == r["h3"], repr(r["s"])
