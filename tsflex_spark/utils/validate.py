"""Data-quality expectations: declarative rule checks over a DataFrame.

The pipeline-hygiene step run before/after big jobs (ingest, feature
backfill, corpus curation): assert schema-level facts (no NULL keys,
values in range, strings match a pattern) and get per-rule violation
counts from ONE aggregate pass — no shuffle beyond the scalar-agg
combine, so checking 100 TB costs one scan. Key-uniqueness is the one
rule that inherently needs a shuffle and is a separate function.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(*cols: str) -> Column:
    """Rule: every listed column is non-NULL."""
    c = F.lit(True)
    for col in cols:
        c = c & F.col(col).isNotNull()
    return c


def in_range(col: str, lo=None, hi=None) -> Column:
    """Rule: lo <= col <= hi (either bound optional); NULL fails."""
    c = F.col(col).isNotNull()
    if lo is not None:
        c = c & (F.col(col) >= F.lit(lo))
    if hi is not None:
        c = c & (F.col(col) <= F.lit(hi))
    return c


def matches(col: str, pattern: str) -> Column:
    """Rule: string column fully matches the regex; NULL fails."""
    return F.col(col).isNotNull() & F.col(col).rlike(pattern)


def check_rules(df: DataFrame, rules: Dict[str, Column]) -> dict:
    """Evaluate boolean rule columns (True = row passes) in ONE aggregate
    pass; returns ``{"n_rows": N, "violations": {rule: count}}``.
    NULL rule results count as violations (ANSI three-valued logic would
    otherwise let them slip through an inverted filter).
    """
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.count(F.when(~F.coalesce(expr, F.lit(False)), F.lit(1))).alias(name)
        for name, expr in rules.items()
    ]
    row = df.agg(*aggs).first()
    return {
        "n_rows": row["__n"],
        "violations": {name: row[name] for name in rules},
    }


def expect(df: DataFrame, rules: Dict[str, Column], raise_on_failure: bool = True) -> dict:
    """``check_rules`` + raise ``ValueError`` listing failing rules when
    any rule has violations (set ``raise_on_failure=False`` to only
    report)."""
    report = check_rules(df, rules)
    bad = {k: v for k, v in report["violations"].items() if v > 0}
    if bad and raise_on_failure:
        raise ValueError(f"expectation failures ({report['n_rows']} rows): {bad}")
    return report


def duplicate_keys(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Key-uniqueness check: returns the (key..., n) rows with n > 1.
    One groupBy shuffle on the key — the only expectation that cannot be
    a scalar aggregate. Empty result = key is unique."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


def rule_aggs(rules: Dict[str, Column]) -> list:
    """The violation-count aggregate columns ``check_rules`` uses, for
    callers that attach them to an EXISTING job instead of paying a
    separate scan."""
    return [F.count(F.lit(1)).alias("__n")] + [
        F.count(F.when(~F.coalesce(expr, F.lit(False)), F.lit(1))).alias(name)
        for name, expr in rules.items()
    ]


def observe_rules(df: DataFrame, rules: Dict[str, Column], name: str = "expectations"):
    """Attach expectation counters to ``df`` as observed metrics — the
    violation counts then ride whatever job consumes the frame, costing
    ZERO extra scans (``check_rules`` pays one).

    Batch: returns ``(df, Observation)`` — run any action on the
    returned frame, then read ``observation.get`` (a dict with ``__n``
    plus one violation count per rule).

    Streaming: returns ``(df, None)`` — the metrics surface per
    micro-batch in ``query.lastProgress["observedMetrics"][name]``
    (and in ``QueryProgressEvent`` listeners), giving continuous data-
    quality monitoring on an unbounded stream for free.
    """
    aggs = rule_aggs(rules)
    if df.isStreaming:
        return df.observe(name, *aggs), None
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *aggs), obs
