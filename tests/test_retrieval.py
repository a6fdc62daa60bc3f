"""BM25 / TF-IDF retrieval: python-reference parity + plan shape."""

import math
import re

import numpy as np
import pandas as pd
import pytest

from tsflex_spark.datapipe import retrieval as R

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown dog runs in the park"),
    (2, "spark is a distributed data processing engine"),
    (3, "the fox and the dog are friends in the park"),
    (4, "data engines process distributed queries quickly"),
    (5, ""),
]


def _py_tokens(t):
    return [x for x in re.split(r"[^0-9A-Za-z]+", t.lower()) if x]


def _py_bm25(query, k1=1.2, b=0.75):
    toks = {i: _py_tokens(t) for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    terms = list(dict.fromkeys(_py_tokens(query)))
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        out[i] = s
    return out


@pytest.fixture(scope="module")
def docs_sdf(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_doc_frequencies(docs_sdf):
    dfs = {r["term"]: r["df"] for r in R.doc_frequencies(docs_sdf).collect()}
    assert dfs["the"] == 3  # docs 0, 1, 3 (distinct per doc)
    assert dfs["dog"] == 3
    assert dfs["spark"] == 1
    assert "" not in dfs


def test_bm25_python_parity(docs_sdf):
    got = {
        r["doc_id"]: r["bm25"]
        for r in R.bm25_score(docs_sdf, "quick fox data").collect()
    }
    exp = _py_bm25("quick fox data")
    assert set(got) == set(exp)
    for i in exp:
        assert abs(got[i] - exp[i]) < 1e-12, (i, got[i], exp[i])


def test_bm25_topk_order_and_plan(docs_sdf):
    top = R.bm25_topk(docs_sdf, "distributed data engine", k=3)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = top.collect()
    assert rows[0]["doc_id"] in (2, 4)
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_reuses_persisted_df_table(docs_sdf):
    dft = R.doc_frequencies(docs_sdf)
    a = {r["doc_id"]: r["bm25"] for r in R.bm25_score(docs_sdf, "lazy dog").collect()}
    b = {
        r["doc_id"]: r["bm25"]
        for r in R.bm25_score(docs_sdf, "lazy dog", df_table=dft).collect()
    }
    assert a == b


def test_tfidf_topk(docs_sdf):
    rows = R.tfidf_topk(docs_sdf, "fox park", k=6).collect()
    got = {r["doc_id"]: r["tfidf"] for r in rows}
    # doc 3 has fox AND park; unknown-term-only docs score 0
    assert rows[0]["doc_id"] == 3
    assert got[2] == 0.0 and got[5] == 0.0
    idf_fox, idf_park = math.log(6 / 2), math.log(6 / 2)
    assert abs(got[3] - (idf_fox + idf_park)) < 1e-12


def test_empty_query_raises(docs_sdf):
    with pytest.raises(ValueError, match="no tokens"):
        R.bm25_score(docs_sdf, "!!!")
    with pytest.raises(ValueError, match="no tokens"):
        R.tfidf_topk(docs_sdf, "  ")


def test_bm25_join_parity_with_single_query_path(spark, docs_sdf):
    """The inverted-index batch path must reproduce the literal-expression
    single-query path for every query in the batch."""
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "q_id": [0, 1, 2],
                "q_text": ["quick fox data", "distributed data engine", "lazy dog"],
            }
        )
    )
    postings = R.build_postings(docs_sdf)
    n, avgdl = R.corpus_size_and_avgdl(docs_sdf)
    got = (
        R.bm25_join(queries, postings, n_docs=n, avgdl=avgdl, k=None)
        .toPandas()
        .sort_values(["q_id", "doc_id"])
    )
    for q_id, q_text in [(0, "quick fox data"), (1, "distributed data engine"), (2, "lazy dog")]:
        single = {
            r["doc_id"]: r["bm25"] for r in R.bm25_score(docs_sdf, q_text).collect()
        }
        batch = got[got["q_id"] == q_id].set_index("doc_id")["bm25"].to_dict()
        # batch path omits zero-overlap docs; every present score must match
        for doc_id, s in batch.items():
            assert abs(s - single[doc_id]) < 1e-9, (q_id, doc_id)
        missing = set(single) - set(batch)
        assert all(abs(single[d]) < 1e-12 for d in missing)


def test_bm25_join_topk_ranks(spark, docs_sdf):
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": [7], "q_text": ["fox park"]})
    )
    postings = R.build_postings(docs_sdf)
    n, avgdl = R.corpus_size_and_avgdl(docs_sdf)
    rows = (
        R.bm25_join(queries, postings, n_docs=n, avgdl=avgdl, k=2)
        .orderBy("rank")
        .collect()
    )
    assert [r["rank"] for r in rows] == [1, 2]
    assert rows[0]["doc_id"] == 3  # only doc with both terms
