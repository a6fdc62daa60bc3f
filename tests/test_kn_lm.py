"""Interpolated Kneser-Ney LM: python-reference parity + behavior tests."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from tsflex_spark.datapipe.lm import (
    KNModel,
    ngram_rows,
    score_perplexity_kn,
    train_kn_lm,
)

CORPUS = [
    (1, "the cat sat on the mat and the cat slept"),
    (2, "the dog sat on the rug and the dog barked"),
    (3, "a cat and a dog sat on a mat together quietly"),
    (4, "the cat sat on the mat"),
    (5, "entirely novel words appear here zebra quark flux"),
    (6, "on the mat the cat sat on the mat again and again"),
    (7, "tiny"),  # < order tokens -> NULL ppl
]


def _kn_reference(texts, order):
    """Independent driver-side KN implementation mirroring the documented
    formulas (same shifted-type-set construction, same expression
    association order so doubles round identically)."""
    N = order
    docs_tokens = [t.lower().split() for t in texts]
    top = Counter(
        tuple(t[i : i + N]) for t in docs_tokens for i in range(len(t) - N + 1)
    )
    ctxs = {N: {}}
    for g, c in top.items():
        h = g[:-1]
        t_, n_ = ctxs[N].get(h, (0, 0))
        ctxs[N][h] = (t_ + c, n_ + 1)
    tables = {}
    prev_keys = set(top)
    for k in range(N - 1, 0, -1):
        cont = Counter(g[1:] for g in prev_keys)
        tables[k] = dict(cont)
        if k >= 2:
            c2 = {}
            for g, cc in cont.items():
                h = g[:-1]
                t_, n_ = c2.get(h, (0, 0))
                c2[h] = (t_ + cc, n_ + 1)
            ctxs[k] = c2
        prev_keys = set(cont)
    v = len({w for t in docs_tokens for w in t}) + 1
    tot1 = sum(tables[1].values())
    n1p1 = len(tables[1])
    src = {N: top}
    src.update({k: tables[k] for k in range(N - 1, 0, -1)})
    D = {}
    for k in range(N, 0, -1):
        n1 = sum(1 for c in src[k].values() if c == 1)
        n2 = sum(1 for c in src[k].values() if c == 2)
        # degenerate-count fallback mirrors train_kn_lm: D=0.5 when n1=0
        D[k] = n1 / max(n1 + 2 * n2, 1) if n1 > 0 else 0.5

    def logp_e6(gram):
        p = 1.0 / v
        c1 = tables[1].get(gram[-1:], 0)
        p = max(c1 - D[1], 0.0) / tot1 + (D[1] * n1p1 / tot1) * p
        for k in range(2, N + 1):
            sub = gram[N - k :]
            if k < N:
                ck = tables[k].get(sub, 0)
                th = ctxs[k].get(sub[:-1])
            else:
                ck = top.get(gram, 0)
                th = ctxs[N].get(gram[:-1])
            if th is not None and th[0] > 0:
                tot, n1p = th
                p = max(ck - D[k], 0.0) / tot + (D[k] * n1p / tot) * p
        return round(math.log(p) * 1e6)

    out = {}
    for (did, _), toks in zip(CORPUS, docs_tokens):
        grams = [tuple(toks[i : i + N]) for i in range(len(toks) - N + 1)]
        out[did] = (len(grams), sum(logp_e6(g) for g in grams))
    return out


@pytest.mark.parametrize("order", [2, 3])
def test_kn_parity_vs_python_reference(spark, order):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    model = train_kn_lm(docs, "text", order=order)
    got = {
        r["doc_id"]: (r["n_ngrams"], r["sum_logp_e6"])
        for r in score_perplexity_kn(docs, model, "text").collect()
    }
    exp = _kn_reference([t for _, t in CORPUS], order)
    for did, (n_exp, s_exp) in exp.items():
        n_got, s_got = got[did]
        assert n_got == n_exp, did
        # per-gram micro-nat rounding: JVM log vs libm log may differ by
        # 1 ulp at a .5 boundary — allow 1 micro-nat per gram
        assert abs(s_got - s_exp) <= n_exp, (did, s_got, s_exp)


def test_kn_ranks_in_distribution_text_lower(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    model = train_kn_lm(docs, "text", order=3)
    probe = spark.createDataFrame(
        [
            (100, "the cat sat on the mat"),  # in-distribution
            (101, "mat quark the flux zebra on"),  # scrambled
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["ppl"]
        for r in score_perplexity_kn(probe, model, "text").collect()
    }
    assert out[100] < out[101]


def test_kn_short_doc_null_and_broadcast_path(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    model = train_kn_lm(docs, "text", order=3)
    out = {
        r["doc_id"]: r
        for r in score_perplexity_kn(
            docs, model, "text", broadcast_model=True
        ).collect()
    }
    assert out[7]["ppl"] is None and out[7]["n_ngrams"] == 0
    # broadcast path identical to the shuffle path
    out2 = {
        r["doc_id"]: r["sum_logp_e6"]
        for r in score_perplexity_kn(docs, model, "text").collect()
    }
    assert {k: v["sum_logp_e6"] for k, v in out.items()} == out2


def test_kn_save_load_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    model = train_kn_lm(docs, "text", order=3)
    model.save(str(tmp_path / "kn"))
    back = KNModel.load(spark, str(tmp_path / "kn"), order=3)
    a = {
        r["doc_id"]: r["sum_logp_e6"]
        for r in score_perplexity_kn(docs, model, "text").collect()
    }
    b = {
        r["doc_id"]: r["sum_logp_e6"]
        for r in score_perplexity_kn(docs, back, "text").collect()
    }
    assert a == b


def test_kn_dispatch_in_filter_and_buckets(spark):
    from tsflex_spark.datapipe.lm import perplexity_filter, ppl_buckets

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    model = train_kn_lm(docs, "text", order=3)
    # a permissive threshold keeps everything incl. the short doc
    kept = perplexity_filter(docs, model, "text", max_ppl=1e12)
    assert kept.count() == len(CORPUS)
    # a data-derived strict threshold drops the high-ppl rows but keeps
    # the short doc (undefined ppl)
    ppls = sorted(
        r["ppl"]
        for r in score_perplexity_kn(docs, model, "text").collect()
        if r["ppl"] is not None
    )
    strict = perplexity_filter(docs, model, "text", max_ppl=ppls[len(ppls) // 2])
    ids = {r["doc_id"] for r in strict.select("doc_id").collect()}
    assert 7 in ids and len(ids) < len(CORPUS)
    bucketed = ppl_buckets(docs, model, "text")
    rows = {r["doc_id"]: r["ppl_bucket"] for r in bucketed.collect()}
    assert rows[7] is None  # short doc: undefined ppl -> NULL bucket
    assert set(rows.values()) <= {"head", "middle", "tail", None}


def test_ngram_rows_counts(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    rows = ngram_rows(docs, "text", "doc_id", 3).collect()
    got = {(r["g1"], r["g2"], r["g3"]) for r in rows}
    assert got == {("a", "b", "c"), ("b", "c", "d")}
    assert ngram_rows(docs, "text", "doc_id", 5).count() == 0
