"""Lexical retrieval over the ``documents`` table: distributed TF-IDF /
BM25 (Robertson & Spärck Jones; the Okapi BM25 form) — the sparse
complement to the dense ANN stack in ``datapipe/similarity.py``.

Scale design:

- **Corpus statistics** (``doc_frequencies``): terms explode per-doc
  DISTINCT (shingle-style: the shuffle carries ``(term_hash, 1)`` pairs,
  never text), one groupBy — the same shape as the shingle tables in
  ``dedup.py``. The result is a bounded vocabulary table.
- **Scoring** (``bm25_score``, ``tfidf_topk``): the query's few terms
  (with their document frequencies) ride the plan as literals/broadcast;
  the corpus is scanned ONCE, term counts per doc come from one
  in-row codegen pass (no explode, no shuffle of the corpus), and the
  final top-k is a TakeOrdered — the interactive single-query plan.
- **Batch scoring** (``build_postings`` + ``bm25_join``): thousands of
  queries at once join an inverted index instead — one (term, doc)
  postings aggregate, then one broadcast-query join + per-(query, doc)
  sum; pre-bucket the postings by term and the big side never
  re-shuffles.

Tokenization is lower-cased ``\\W+`` splitting shared by both the stats
and scoring paths (consistency matters more than linguistics here).
"""

from __future__ import annotations

import re
from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = r"[^0-9A-Za-z]+"


def _tokens_col(text: Column) -> Column:
    # split + array_remove are native Catalyst collection expressions —
    # NOT interpreted HOF lambdas (the winnowing perf lesson)
    return F.array_remove(F.split(F.lower(text), _TOKEN_RE), "")


def tokenize_query(query: str) -> List[str]:
    """Driver-side twin of ``_tokens_col`` — MUST stay in lockstep."""
    return [t for t in re.split(_TOKEN_RE, query.lower()) if t]


def doc_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-term document frequency: ``(term, df)``.

    Terms are deduplicated per document BEFORE the shuffle
    (``array_distinct``), so the exchange carries one short string per
    distinct (doc, term) — the vocabulary table that comes back is
    bounded by vocabulary size, not corpus size. Persist it once per
    corpus snapshot; every query scores against it.
    """
    from tsflex_spark.utils.data import fan_out

    # fan_out: single-file scans are one partition (guide §2.5)
    terms = fan_out(df).select(
        F.explode(F.array_distinct(_tokens_col(F.col(text_col)))).alias("term")
    )
    return terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def corpus_size_and_avgdl(
    df: DataFrame, text_col: str = "text"
) -> "tuple[int, float]":
    """(N docs, average token count) in one scalar aggregate."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(_tokens_col(F.col(text_col)))).alias("avgdl"),
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def _term_freq(toks: Column, term: str) -> Column:
    """In-row term frequency via the array_remove counting trick:
    ``tf = size(toks) - size(array_remove(toks, t))`` — pure codegen
    collection expressions, no explode, no interpreted lambda."""
    return (F.size(toks) - F.size(F.array_remove(toks, term))).cast("double")


def bm25_score(
    df: DataFrame,
    query: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_table: Optional[DataFrame] = None,
    k1: float = 1.2,
    b: float = 0.75,
    out_col: str = "bm25",
) -> DataFrame:
    """Okapi BM25 of every document against one query string.

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))`` with
    ``idf(t) = ln(1 + (N-df+0.5)/(df+0.5))``. The per-term document
    frequencies come from ``df_table`` (pass the persisted
    ``doc_frequencies`` output; computed on the fly otherwise) but enter
    the plan as LITERALS — the corpus scan itself is one narrow pass.
    """
    import math

    terms = tokenize_query(query)
    if not terms:
        raise ValueError("query has no tokens")
    if df_table is None:
        df_table = doc_frequencies(df, text_col, id_col)
    n, avgdl = corpus_size_and_avgdl(df, text_col)
    if avgdl <= 0:
        raise ValueError("empty corpus")
    df_rows = {
        r["term"]: int(r["df"])
        for r in df_table.where(F.col("term").isin(terms)).collect()
    }

    d = df.withColumn("__toks", _tokens_col(F.col(text_col)))
    toks = F.col("__toks")
    dl = F.size(toks).cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
    score = F.lit(0.0)
    for t in dict.fromkeys(terms):  # dedup, stable order
        dft = df_rows.get(t, 0)
        idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
        tf = _term_freq(toks, t)
        score = score + F.lit(idf) * tf * F.lit(k1 + 1.0) / (tf + norm)
    return d.select(F.col(id_col), score.alias(out_col))


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_table: Optional[DataFrame] = None,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 — TakeOrdered (per-partition heap), never
    a global sort of the corpus."""
    scored = bm25_score(
        df, query, text_col=text_col, id_col=id_col, df_table=df_table, k1=k1, b=b
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)


def tfidf_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_table: Optional[DataFrame] = None,
) -> DataFrame:
    """Top-k by plain TF-IDF (``tf · ln(N/df)``, raw counts) — the
    simpler baseline when BM25's saturation/length terms aren't wanted."""
    import math

    terms = tokenize_query(query)
    if not terms:
        raise ValueError("query has no tokens")
    if df_table is None:
        df_table = doc_frequencies(df, text_col, id_col)
    n = df.count()
    df_rows = {
        r["term"]: int(r["df"])
        for r in df_table.where(F.col("term").isin(terms)).collect()
    }
    d = df.withColumn("__toks", _tokens_col(F.col(text_col)))
    toks = F.col("__toks")
    score = F.lit(0.0)
    for t in dict.fromkeys(terms):
        dft = df_rows.get(t, 0)
        if dft == 0:
            continue
        score = score + _term_freq(toks, t) * F.lit(math.log(n / dft))
    scored = d.select(F.col(id_col), score.alias("tfidf"))
    return scored.orderBy(F.col("tfidf").desc(), F.col(id_col)).limit(k)


# ------------------------------------------------- batch path: inverted index
def build_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Postings list ``(term, doc_id, tf, dl)`` — the inverted index.

    One explode + one groupBy on ``(term, doc_id)``; the shuffle carries
    short strings + two ints, never text. Write it out partitioned /
    bucketed by ``term`` (``io.write_bucketed``) and batch scoring
    becomes a co-located join.
    """
    from tsflex_spark.utils.data import fan_out

    toks = fan_out(df).select(
        F.col(id_col),
        F.explode(_tokens_col(F.col(text_col))).alias("term"),
        F.size(_tokens_col(F.col(text_col))).alias("dl"),
    )
    return toks.groupBy("term", id_col).agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )


def bm25_join(
    queries: DataFrame,
    postings: DataFrame,
    *,
    n_docs: int,
    avgdl: float,
    q_id_col: str = "q_id",
    q_text_col: str = "q_text",
    id_col: str = "doc_id",
    k: Optional[int] = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 for a BATCH of queries against a postings table — the scale
    path when scoring thousands of queries at once (the literal-expression
    plan in ``bm25_score`` is one scan per query; this is ONE join for
    all of them).

    Plan: explode query terms (tiny) → broadcast-join against postings
    on ``term`` (the corpus-sized side shuffles at most once, on its own
    term key if pre-bucketed — broadcast of the query side keeps it
    shuffle-free here) → per-(query, doc) sum of score terms → top-k per
    query via ranked window. ``n_docs``/``avgdl`` come from
    ``corpus_size_and_avgdl`` once per corpus snapshot.

    Returns ``(q_id, doc_id, bm25, rank)`` (all scored pairs when
    ``k=None``). Documents sharing no term with a query score 0 and are
    absent — BM25's natural sparsity.
    """
    from pyspark.sql import Window

    if avgdl <= 0:
        raise ValueError("avgdl must be positive")
    qt = queries.select(
        F.col(q_id_col),
        F.explode(F.array_distinct(_tokens_col(F.col(q_text_col)))).alias("term"),
    )
    # per-term document frequency from the postings themselves (df =
    # number of docs holding the term) — restricted to the query terms
    # BEFORE the aggregate via a broadcast semi-join
    dfs = (
        postings.join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    tf = F.col("tf").cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(float(avgdl)))
    scored = (
        F.broadcast(qt)
        .join(postings, "term")
        .join(F.broadcast(dfs), "term")
        .select(
            F.col(q_id_col),
            F.col(id_col),
            (idf * tf * F.lit(k1 + 1.0) / (tf + norm)).alias("__t"),
        )
        .groupBy(q_id_col, id_col)
        .agg(F.sum("__t").alias("bm25"))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("bm25").desc(), F.col(id_col))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if k is not None:
        ranked = ranked.where(F.col("rank") <= k)
    return ranked.select(q_id_col, id_col, "bm25", "rank")
