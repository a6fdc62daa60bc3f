"""Dataset curation: reproducible splits and stratified sampling.

Training pipelines need splits that are STABLE across reruns, cluster
sizes, and row order — ``randomSplit`` is none of those (it samples per
partition of a given ordering). These ops derive membership from a hash
of the row's identity, so the same id lands in the same split on every
machine, forever, regardless of partitioning.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[float],
    names: Sequence[str] = ("train", "val", "test"),
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Tag every row with a split name by hashing its id — reproducible
    train/val/test assignment (same id → same split, independent of
    partitioning, ordering, or cluster size; adding rows never moves
    existing ones between splits).

    ``weights`` need not sum to 1 (normalized). Buckets are assigned on
    ``pmod(xxhash64(id, seed), 10^6)`` against cumulative weight
    boundaries — all codegen, no shuffle.
    """
    assert len(weights) == len(names) and len(names) > 0
    total = float(sum(weights))
    m = 1_000_000
    bounds = []
    acc = 0.0
    for w in weights:
        acc += float(w) / total
        bounds.append(int(round(acc * m)))
    bounds[-1] = m  # close the last bucket against float drift
    b = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(m))
    # nested whens smallest-bound-first: each row takes the FIRST boundary
    # it falls under
    expr = F.lit(None).cast("string")
    for name, ub in zip(names, bounds):
        expr = F.coalesce(expr, F.when(b < F.lit(ub), F.lit(name)))
    return df.withColumn(out_col, expr)


def mix_sources(
    df: DataFrame,
    source_col: str,
    target_weights: Dict,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Down-sample per-source so the kept corpus matches ``target_weights``
    proportions with MAXIMAL data retention (the "source mixing" step of
    pre-training pipelines: rebalance web/books/code/wiki shares).

    The limiting source keeps 100%: with per-source counts c_s and target
    weights w_s, the largest achievable corpus is T = min_s(c_s / w_s)
    and each source keeps T·w_s rows. Membership is a pure function of
    (id, seed) — same row kept on every rerun, partitioning, or cluster
    size. Fully declarative: per-source counts are a tiny aggregate
    broadcast back; no collect, no driver loop. Sources absent from
    ``target_weights`` are dropped.
    """
    m = 1_000_000
    spark = df.sparkSession
    w = spark.createDataFrame(
        [(str(k), float(v)) for k, v in target_weights.items()],
        f"{source_col} string, __w double",
    )
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__c"))
    wc = counts.join(w, on=source_col)  # inner: unlisted sources drop out
    lim = wc.agg(
        F.min(F.col("__c").cast("double") / F.col("__w")).alias("__t")
    )
    frac = wc.join(F.broadcast(lim)).select(
        source_col,
        F.least(
            F.col("__t") * F.col("__w") / F.col("__c").cast("double"), F.lit(1.0)
        ).alias("__keep"),
    )
    b = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(m))
    out = df.join(F.broadcast(frac), on=source_col)
    return out.where(b < (F.col("__keep") * m).cast("long")).drop("__keep")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Dict,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the hash of its
    id falls under its stratum's fraction. Unlike ``DataFrame.sampleBy``
    the decision is a pure function of (id, seed) — stable across reruns
    and partitionings; strata missing from ``fractions`` are dropped.
    """
    m = 1_000_000
    b = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(m))
    cond = F.lit(False)
    for k, frac in fractions.items():
        cond = cond | (
            (F.col(strata_col) == F.lit(k)) & (b < F.lit(int(round(float(frac) * m))))
        )
    return df.where(cond)


def corpus_stats(
    df: DataFrame,
    text_col: str,
    source_col: str,
    lang_col: Optional[str] = None,
) -> DataFrame:
    """Per-source corpus report — the numbers a mixture plan
    (``mix_sources`` weights, token budgets) is written against:
    document count, total/mean characters, total/mean whitespace tokens,
    and (when ``lang_col`` is given) distinct languages plus the share of
    the majority language.

    One hash-aggregate over the corpus; the token count is a codegen
    expression (no Python, no explode). The majority-language share runs
    as a two-level aggregate — (source, lang) counts, then max/sum per
    source — so the big shuffle carries one row per (source, lang), not
    per document.
    """
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    toks = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(toks)
    base = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).alias("total_chars"),
        F.avg(F.length(text_col)).alias("mean_chars"),
        F.sum(toks).alias("total_tokens"),
        F.avg(toks).alias("mean_tokens"),
    )
    if lang_col is None:
        return base
    per_lang = df.groupBy(source_col, lang_col).agg(F.count(F.lit(1)).alias("__c"))
    lang = per_lang.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_langs"),
        (F.max("__c").cast("double") / F.sum("__c")).alias("top_lang_share"),
    )
    return base.join(lang, on=source_col)
