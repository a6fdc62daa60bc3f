"""Skew mitigation for joins and aggregations on hot keys.

AQE's skew-join rule (``spark.sql.adaptive.skewJoin.enabled``) splits
oversized SORT-MERGE partitions at runtime and is the first line of
defense — these helpers cover the cases it does not reach:

- shuffled HASH joins and any join whose skew AQE under-detects
  (median-based threshold misses "one key = 40% of rows" when the
  rest are uniform);
- aggregations with per-key state too large for one task (holistic
  aggs: ``collect_list``, exact percentiles — algebraic aggs are
  already fixed by Spark's map-side partial aggregation);
- plans where the skew is KNOWN ahead of time (a null-heavy foreign
  key, a bot user, an empty-string category) and paying the runtime
  detection is wasteful.

The classic construction: replicate the small side once per salt
bucket, scatter the big side's hot rows across buckets with a
deterministic hash-salt, join on (key, salt). ``salted_join`` salts
every key; ``salted_join_hot`` salts ONLY an explicit hot-key list
(differential salting: the uniform mass keeps a 1× small side and the
replication cost is paid per hot key, not per row).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def key_skew_stats(
    df: DataFrame, keys: Sequence[str], top: int = 20
) -> DataFrame:
    """Per-key row counts for the heaviest ``top`` keys plus their share
    of the table — the diagnostic that decides whether (and which) keys
    need salting. One aggregation; the result is ``top`` rows."""
    total = df.count()
    counts = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy(F.col("rows").desc(), *keys)
        .limit(int(top))
    )
    return counts.withColumn(
        "share", F.col("rows").cast("double") / F.lit(float(max(total, 1)))
    )


def _salt_col(
    df: DataFrame, buckets: int, salt_on: Optional[Sequence[str]] = None
) -> F.Column:
    # deterministic per-row scatter: hash of the row's CONTENT (all
    # columns unless the caller names some), never
    # monotonically_increasing_id — a nondeterministic salt re-salts
    # rows differently on stage retry after a shuffle fetch failure,
    # which duplicates or loses rows through the downstream exchange
    # (the SPARK-23207 class of bug). The trade: rows that are full
    # duplicates land in the same bucket, so a hot key made of IDENTICAL
    # rows will not scatter — pass salt_on naming a distinguishing
    # column if content-identical hot rows are possible.
    cols = list(salt_on) if salt_on else list(df.columns)
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in cols]), F.lit(int(buckets))
    ).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    buckets: int = 8,
    salt_on: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Equi-join where every ``big``-side key is scattered over
    ``buckets`` salt values and ``small`` is replicated ``buckets``×.

    Row-for-row equivalent to ``big.join(small, on, how)`` for
    ``inner`` and ``left`` joins (the salted key partition is a
    refinement of the key partition). The trade: small-side shuffle
    volume ×``buckets`` buys a ``buckets``-way split of every hot
    key's task. Use when the whole key distribution is heavy-tailed;
    prefer ``salted_join_hot`` when you can name the hot keys.

    The salt is a content hash (retry-deterministic); ``salt_on``
    names the columns to hash (default: all of ``big``'s columns).
    """
    on = list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    b = big.withColumn(_SALT, _salt_col(big, buckets, salt_on))
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(int(buckets) - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("int"))
    return b.join(s, on=on + [_SALT], how=how).drop(_SALT)


def salted_join_hot(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    hot_keys: Sequence,
    how: str = "inner",
    buckets: int = 32,
    salt_on: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Differential salting: only rows whose key is in ``hot_keys``
    (values of the FIRST join column for a single-column join, tuples
    for composite) scatter over ``buckets``; every other row keeps
    salt 0 and the small side replicates only its hot rows.

    Small-side cost: |small| + buckets×|hot rows| — per hot KEY, not
    per corpus row. The salt literal list rides the plan (hot-key sets
    are short by definition; derive them with ``key_skew_stats``).
    """
    on = list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join_hot supports inner/left joins")
    if not hot_keys:
        return big.join(small, on=on, how=how)
    if len(on) == 1:
        is_hot = F.col(on[0]).isin(*[k for k in hot_keys])

        def hot_of(df):
            return df.filter(F.col(on[0]).isin(*[k for k in hot_keys]))

        def cold_of(df):
            return df.filter(
                ~F.col(on[0]).isin(*[k for k in hot_keys])
                | F.col(on[0]).isNull()
            )
    else:
        key_struct = F.struct(*[F.col(c) for c in on])
        lits = [
            F.struct(*[F.lit(v).alias(c) for v, c in zip(k, on)])
            for k in hot_keys
        ]
        is_hot = key_struct.isin(*lits)

        def hot_of(df):
            return df.filter(key_struct.isin(*lits))

        def cold_of(df):
            return df.filter(~key_struct.isin(*lits) | key_struct.isNull())

    b = big.withColumn(
        _SALT,
        F.when(is_hot, _salt_col(big, buckets, salt_on)).otherwise(F.lit(0)).cast("int"),
    )
    s_hot = hot_of(small).withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(int(buckets) - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("int"))
    s_cold = cold_of(small).withColumn(_SALT, F.lit(0).cast("int"))
    s = s_cold.unionByName(s_hot)
    return b.join(s, on=on + [_SALT], how=how).drop(_SALT)


def salted_collect_list(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    buckets: int = 16,
    out_col: Optional[str] = None,
    salt_on: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Two-level ``collect_list`` for hot keys: partial lists per
    (key, salt) — ``buckets`` bounded tasks instead of one giant one —
    then ``flatten`` of the ``buckets`` partial lists per key. The
    final row per key is still list-sized; this bounds TASK input, not
    result size (a result too big for one row needs a layout change,
    not salting). Order within the list is salt-then-arrival —
    ``collect_list`` never promised an order either."""
    keys = list(keys)
    out = out_col or f"{value_col}_list"
    salted = df.withColumn(_SALT, _salt_col(df, buckets, salt_on))
    partial = salted.groupBy(*keys, _SALT).agg(
        F.collect_list(value_col).alias("__part")
    )
    return (
        partial.groupBy(*keys)
        .agg(F.flatten(F.collect_list("__part")).alias(out))
    )


def approx_heavy_hitters(
    df: DataFrame, keys: Sequence[str], support: float = 0.01
) -> DataFrame:
    """Approximate hot-key detection without a full groupBy:
    ``DataFrame.freqItems`` (Karp/Papadimitriou/Shenker single-pass
    counters) returns every key whose frequency MAY exceed ``support``
    (false positives possible, false negatives not). The cheap first
    pass at 100 TB: feed its output to ``key_skew_stats`` restricted by
    an ``isin`` filter — or straight into ``salted_join_hot`` when a
    false-positive hot key only costs a little extra replication.

    Returns one row per candidate key combination (exploded from
    freqItems' array-per-column result; combinations are the cross of
    per-column candidates when ``len(keys) > 1``)."""
    keys = list(keys)
    arrs = df.freqItems(keys, support=float(support)).collect()[0]
    out = None
    for k in keys:
        vals = [(v,) for v in (arrs[f"{k}_freqItems"] or [])]
        col_df = df.sparkSession.createDataFrame(vals, f"`{k}` {df.schema[k].dataType.simpleString()}") if vals else df.sparkSession.createDataFrame([], f"`{k}` {df.schema[k].dataType.simpleString()}")
        out = col_df if out is None else out.crossJoin(col_df)
    return out
