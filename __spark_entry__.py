"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` holds the DuckDB
equivalent. Column names/aliases match pairwise (the driver hash-compares
values after sorting columns by name). Float aggregates are rounded to 4
decimals on BOTH sides to absorb summation-order differences.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsflex_spark import FeatureCollection, FeatureDescriptor

# epoch-microsecond window constants shared by Spark + DuckDB oracle
H1 = 3_600_000_000  # 1 hour
M30 = 1_800_000_000  # 30 min


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsflex_spark.sources import read_events

    return read_events(spark, sf_dir)


# --------------------------------------------------------------------- q:
def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided-rolling feature extraction (SURVEY §2.5): window=1h stride=30m
    over events.value — native-tier aggregates, window_idx='end'.

    ``value`` has exactly 2 decimals, so it is summed as DECIMAL(18,2)
    (exact, summation-order-independent) and mean is derived as sum/count —
    both engines then round identical doubles.
    """
    _utc(spark)
    ev = _events(spark, sf_dir).select(
        "ts", F.col("value").cast("decimal(18,2)").alias("value")
    )
    fc = FeatureCollection(
        [
            FeatureDescriptor("sum", "value", "1h", "30m"),
            FeatureDescriptor("count", "value", "1h", "30m"),
            FeatureDescriptor("min", "value", "1h", "30m"),
            FeatureDescriptor("max", "value", "1h", "30m"),
        ]
    )
    out = fc.calculate(ev, ts_col="ts")
    sum_d = F.col("value__sum__w=1h").cast("double")
    cnt = F.col("value__count__w=1h").cast("bigint")
    return out.select(
        "ts",
        F.try_divide(sum_d, cnt).alias("mean_val"),  # empty window -> NULL
        F.coalesce(sum_d, F.lit(0.0)).alias("sum_val"),
        cnt.alias("cnt_val"),
        F.col("value__min__w=1h").cast("double").alias("min_val"),
        F.col("value__max__w=1h").cast("double").alias("max_val"),
    )


def _oracle_rolling_stats() -> str:
    return f"""
WITH b AS (SELECT epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1 FROM events),
k AS (SELECT t0, t1,
             greatest(CAST(floor((t1 - t0 - {H1}) / {M30}.0) AS BIGINT) + 1, 0) AS nb
      FROM b),
seg AS (SELECT t0 + kk * {M30} AS s_start
        FROM k CROSS JOIN generate_series(0, 100000) AS g(kk)
        WHERE kk < nb),
agg AS (SELECT s_start,
               sum(CAST(e.value AS DECIMAL(18,2))) AS sum_dec,
               count(e.value)                      AS cnt_val,
               min(e.value)                        AS min_raw,
               max(e.value)                        AS max_raw
        FROM seg LEFT JOIN events e
          ON epoch_us(e.ts) >= s_start AND epoch_us(e.ts) < s_start + {H1}
        GROUP BY s_start)
SELECT make_timestamp(s_start + {H1}) AS ts,
       CAST(sum_dec AS DOUBLE) / cnt_val      AS mean_val,
       coalesce(CAST(sum_dec AS DOUBLE), 0.0) AS sum_val,
       cnt_val,
       min_raw AS min_val,
       max_raw AS max_val
FROM agg ORDER BY ts
"""


def q_rolling_pop_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population std/var (np ddof=0 → stddev_pop/var_pop — SURVEY §2.4
    correctness trap) + exact median over 2h/1h windows.

    Population moments are derived from exact decimal sums (sum, sum of
    squares, count) so both engines round identical doubles — the direct
    ``var_pop``/``stddev_pop`` floats differ in summation order.
    """
    _utc(spark)
    ev = _events(spark, sf_dir).select(
        "ts",
        F.col("value").alias("value"),
        F.col("value").cast("decimal(18,2)").alias("valued"),
        (F.col("value") * F.col("value")).cast("decimal(28,4)").alias("value2"),
    )
    fc = FeatureCollection(
        [
            FeatureDescriptor("sum", "valued", "2h", "1h"),
            FeatureDescriptor("count", "valued", "2h", "1h"),
            FeatureDescriptor("sum", "value2", "2h", "1h"),
            FeatureDescriptor("median", "value", "2h", "1h"),
        ]
    )
    out = fc.calculate(ev, ts_col="ts")
    s1 = F.col("valued__sum__w=2h").cast("double")
    s2 = F.col("value2__sum__w=2h").cast("double")
    n = F.col("valued__count__w=2h").cast("bigint")
    mean = F.try_divide(s1, n)
    # empty window -> NULL (not 0): greatest() must not swallow the NULL
    var = F.when(
        n > 0, F.greatest(F.try_divide(s2, n) - mean * mean, F.lit(0.0))
    )
    return out.select(
        "ts",
        F.sqrt(var).alias("std_val"),
        var.alias("var_val"),
        F.col("value__median__w=2h").alias("median_val"),
    )


def _oracle_rolling_pop_moments() -> str:
    w, s = 2 * H1, H1
    return f"""
WITH b AS (SELECT epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1 FROM events),
k AS (SELECT t0, t1,
             greatest(CAST(floor((t1 - t0 - {w}) / {s}.0) AS BIGINT) + 1, 0) AS nb
      FROM b),
seg AS (SELECT t0 + kk * {s} AS s_start
        FROM k CROSS JOIN generate_series(0, 100000) AS g(kk)
        WHERE kk < nb),
agg AS (SELECT s_start,
               sum(CAST(e.value AS DECIMAL(18,2)))               AS s1,
               sum(CAST(e.value * e.value AS DECIMAL(28,4)))     AS s2,
               count(e.value)                                    AS n,
               median(e.value)                                   AS med
        FROM seg LEFT JOIN events e
          ON epoch_us(e.ts) >= s_start AND epoch_us(e.ts) < s_start + {w}
        GROUP BY s_start),
der AS (SELECT s_start, n, med,
               CASE WHEN n = 0 THEN NULL
                    ELSE greatest(CAST(s2 AS DOUBLE) / n
                                  - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                                  0.0) END AS var_raw
        FROM agg)
SELECT make_timestamp(s_start + {w}) AS ts,
       sqrt(var_raw) AS std_val,
       var_raw       AS var_val,
       med           AS median_val
FROM der ORDER BY ts
"""


def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_by_all mode (SURVEY §2.6): features per distinct event_type."""
    _utc(spark)
    fc = FeatureCollection(
        [
            FeatureDescriptor("sum", "value", "1h", "1h"),
            FeatureDescriptor("count", "value", "1h", "1h"),
            FeatureDescriptor("max", "value", "1h", "1h"),
        ]
    )
    out = fc.calculate(
        _events(spark, sf_dir).select(
            "ts", "event_type", F.col("value").cast("decimal(18,2)").alias("value")
        ),
        ts_col="ts",
        group_by_all="event_type",
    )
    sum_d = F.col("value__sum__w=manual").cast("double")
    cnt = F.col("value__count__w=manual").cast("bigint")
    return out.select(
        "event_type",
        (sum_d / cnt).alias("mean_val"),
        cnt.alias("cnt_val"),
        F.col("value__max__w=manual").cast("double").alias("max_val"),
    )


def _oracle_group_by_all() -> str:
    return """
SELECT event_type,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS mean_val,
       count(value) AS cnt_val,
       max(value)   AS max_val
FROM events WHERE event_type IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational substrate check: TPC-H Q1-style pricing summary."""
    _utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sq"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("_sbp"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,4)"
                )
            ).alias("_sdp"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_sq").cast("double").alias("sum_qty"),
        F.col("_sbp").cast("double").alias("sum_base_price"),
        F.col("_sdp").cast("double").alias("sum_disc_price"),
        (F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def _oracle_tpch_q1() -> str:
    return """
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         sum(CAST(l_quantity AS DECIMAL(18,2)))      AS sq,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sbp,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS sdp,
         count(*) AS count_order
  FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
  GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus,
       CAST(sq AS DOUBLE)  AS sum_qty,
       CAST(sbp AS DOUBLE) AS sum_base_price,
       CAST(sdp AS DOUBLE) AS sum_disc_price,
       CAST(sq AS DOUBLE) / count_order AS avg_qty,
       count_order
FROM agg ORDER BY l_returnflag, l_linestatus
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on documents.text (hash-groupBy — SURVEY north-star)."""
    _utc(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from tsflex_spark.datapipe.dedup import dedup_exact_stats

    return dedup_exact_stats(docs, "text", id_col="doc_id")


def _oracle_dedup_exact() -> str:
    return """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY text ORDER BY keep_id
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis ops: char/token counts per document."""
    _utc(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from tsflex_spark.datapipe.text import text_stats

    return text_stats(docs, "text", id_col="doc_id")


def _oracle_text_stats() -> str:
    return """
SELECT doc_id,
       length(text) AS n_chars,
       len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens
FROM documents ORDER BY doc_id
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: strided-rolling multi-agg
    feature extraction over the events stream."""
    return q_rolling_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rolling_stats": q_rolling_stats,
        "rolling_pop_moments": q_rolling_pop_moments,
        "group_by_all": q_group_by_all,
        "tpch_q1": q_tpch_q1,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rolling_stats": _oracle_rolling_stats(),
        "rolling_pop_moments": _oracle_rolling_pop_moments(),
        "group_by_all": _oracle_group_by_all(),
        "tpch_q1": _oracle_tpch_q1(),
        "dedup_exact": _oracle_dedup_exact(),
        "text_stats": _oracle_text_stats(),
    }
