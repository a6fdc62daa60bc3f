"""keyed_fan_out — the shared keyed input fan-out (the shingle_rows
pattern, extracted r11 and reused by repetition_stats and the DSIR
gram pass).

Contract: hash-repartition by the key so a downstream explode +
groupBy(key, ...) chain needs no second exchange over the exploded
table; pin the partition count to the scan's split count when the scan
has MORE splits than defaultParallelism (no task ever amplifies more
than one input split), otherwise leave the bare REPARTITION_BY_COL
form so AQE may coalesce. Values must be partitioning-independent.
"""

from pyspark.sql import functions as F

from tsflex_spark.utils.data import keyed_fan_out


def test_pins_to_input_splits_when_wider_than_parallelism(spark):
    par = spark.sparkContext.defaultParallelism
    wide = spark.range(10_000).repartition(par + 8).withColumn("k", F.col("id") % 50)
    out = keyed_fan_out(wide, "k")
    assert out.rdd.getNumPartitions() == par + 8


def test_small_input_uses_bare_keyed_repartition(spark):
    small = spark.range(100).coalesce(1).withColumn("k", F.col("id") % 5)
    out = keyed_fan_out(small, "k")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # bare repartition(col) — AQE-coalescable keyed exchange
    assert "RepartitionByExpression" in plan or "REPARTITION_BY_COL" in plan


def test_values_identical_under_keyed_fan_out(spark):
    # a repetition_stats-shaped chain: explode per key, count per
    # (key, gram), stats per key — must be bit-identical with and
    # without the keyed fan-out
    base = spark.range(200).select(
        F.col("id").alias("k"),
        F.array(
            (F.col("id") % 7).cast("string"),
            (F.col("id") % 3).cast("string"),
            (F.col("id") % 7).cast("string"),
        ).alias("toks"),
    )

    def chain(df):
        g = df.select("k", F.explode("toks").alias("g"))
        per = g.groupBy("k", "g").agg(F.count(F.lit(1)).alias("c"))
        return (
            per.groupBy("k")
            .agg(F.sum("c").alias("tot"), F.max("c").alias("mx"))
            .orderBy("k")
        )

    plain = chain(base).collect()
    fanned = chain(keyed_fan_out(base, "k")).collect()
    assert plain == fanned


def test_repetition_stats_values_unchanged_by_partitioning(spark):
    # the operator this round rekeyed: same rows from a 1-partition and
    # a pre-partitioned input
    from tsflex_spark.datapipe.text import repetition_stats

    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("aa bb aa bb line\nrepeat line\nrepeat line\ndoc "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    one = repetition_stats(docs.coalesce(1), "text", "doc_id").orderBy("doc_id").collect()
    many = repetition_stats(docs.repartition(8), "text", "doc_id").orderBy("doc_id").collect()
    assert one == many
