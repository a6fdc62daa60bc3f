"""Hypothesis property tests for the new ops.

Each example batches MANY generated values into ONE Spark job (the
xxh fuzz-test pattern) — property coverage without per-example session
overhead.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_tokenizer_lockstep(spark, texts):
    """retrieval.tokenize_query (driver, feeds oracle literals) and
    _tokens_col (Catalyst, scores the corpus) MUST agree on every string
    — the BM25 gate's bit-parity rests on this."""
    from tsflex_spark.datapipe.retrieval import _tokens_col, tokenize_query

    pdf = pd.DataFrame({"i": range(len(texts)), "t": texts})
    sdf = spark.createDataFrame(pdf)
    got = {
        r["i"]: list(r["toks"])
        for r in sdf.select("i", _tokens_col(F.col("t")).alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == tokenize_query(t), repr(t)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_quantize_roundtrip_bound(spark, vectors):
    """int8 round-trip error is bounded by scale/2 per element for ANY
    finite float32 vectors, including zeros and denormals."""
    from tsflex_spark.datapipe.embedding import dequantize_int8, quantize_int8

    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vectors), dtype="int64"),
            "embedding": [np.asarray(v, dtype="float32") for v in vectors],
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = (
        dequantize_int8(quantize_int8(sdf).drop("embedding"), out_col="back")
        .orderBy("vec_id")
        .toPandas()
    )
    X = np.asarray([np.asarray(v, dtype="float32") for v in vectors], dtype="float64")
    B = np.asarray(out["back"].tolist(), dtype="float64")
    scale = np.abs(X).max(axis=1) / 127.0
    err = np.abs(X - B).max(axis=1)
    # float32 storage of the scale adds one more half-ulp of slack
    assert np.all(err <= scale / 2 + np.abs(scale) * 1e-6 + 1e-30)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=60),
    st.integers(min_value=0, max_value=9),
)
def test_bm25_tf_counting_trick(spark, digits, probe):
    """size(toks) - size(array_remove(toks, t)) == exact occurrence count
    for arbitrary token multisets."""
    from tsflex_spark.datapipe.retrieval import _term_freq, _tokens_col

    text = " ".join(f"w{d}" for d in digits)
    sdf = spark.createDataFrame(pd.DataFrame({"t": [text]}))
    tf = sdf.select(
        _term_freq(_tokens_col(F.col("t")), f"w{probe}").alias("tf")
    ).collect()[0]["tf"]
    assert tf == float(digits.count(probe))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.floats(min_value=-100.0, max_value=100.0, allow_nan=False, width=32),
        min_size=12,
        max_size=48,
    ),
    st.floats(min_value=-50.0, max_value=50.0, allow_nan=False),
)
def test_change_and_location_natives_property(spark, vals, t):
    """argmax/argmin/abs_max/variation_coefficient + the lag-recipe
    natives (mean_diff/cid_ce/crossings/sum_abs_diff) match a pandas
    reference on arbitrary float series with ties (values rounded to one
    decimal to force them), on SEQUENCE tumbling windows."""
    from tsflex_spark import FeatureCollection, FeatureDescriptor, FuncWrapper
    from tsflex_spark.utils.distributed import with_global_shift

    v = np.round(np.asarray(vals, dtype=np.float64), 1)
    n = len(v)
    pdf = pd.DataFrame({"ts": np.arange(n, dtype=np.int64), "v": v})
    sdf = spark.createDataFrame(pdf)
    sdf = with_global_shift(sdf, "v", "ts", "v_lag", offset=-1)
    w, s = 8, 8
    fc = FeatureCollection(
        [
            FeatureDescriptor("argmax", "v", w, s),
            FeatureDescriptor("argmin", "v", w, s),
            FeatureDescriptor("abs_max", "v", w, s),
            FeatureDescriptor("variation_coefficient", "v", w, s),
            FeatureDescriptor("mean_diff", ("v", "v_lag"), w, s),
            FeatureDescriptor("cid_ce", ("v", "v_lag"), w, s),
            FeatureDescriptor(
                FuncWrapper("crossings", output_names="x", t=float(t)),
                ("v", "v_lag"), w, s,
            ),
            FeatureDescriptor("sum_abs_diff", ("v", "v_lag"), w, s),
        ]
    )
    out = (
        fc.calculate(sdf, ts_col="ts", approve_sparsity=True)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # inner bounds: v_lag starts at ts=1 → grid t0=1; half-open windows
    t0, t1 = 1, n - 1
    nb = max((t1 - t0 - w) // s + 1, 0)
    assert len(out) == nb
    for i in range(nb):
        lo = t0 + i * s
        seg = v[lo : lo + w]
        lagged = v[lo - 1 : lo + w - 1]
        d = seg - lagged
        row = out.iloc[i]
        assert row[f"v__argmax__w={w}"] == lo + int(np.argmax(seg))
        assert row[f"v__argmin__w={w}"] == lo + int(np.argmin(seg))
        assert row[f"v__abs_max__w={w}"] == np.abs(seg).max()
        cv_ref = (
            np.nan if seg.mean() == 0 else seg.std() / seg.mean()
        )
        got_cv = row[f"v__variation_coefficient__w={w}"]
        if np.isnan(cv_ref):
            assert pd.isna(got_cv)
        else:
            assert got_cv == pytest.approx(cv_ref, rel=1e-9, abs=1e-9)
        assert row[f"v|v_lag__mean_diff__w={w}"] == pytest.approx(
            d.mean(), rel=1e-9, abs=1e-9
        )
        assert row[f"v|v_lag__cid_ce__w={w}"] == pytest.approx(
            np.sqrt((d**2).sum()), rel=1e-9, abs=1e-9
        )
        assert row[f"v|v_lag__x__w={w}"] == ((seg > t) != (lagged > t)).sum()
        assert row[f"v|v_lag__sum_abs_diff__w={w}"] == pytest.approx(
            np.abs(d).sum(), rel=1e-9, abs=1e-9
        )


# ---------------------------------------------------------------------------
# BPE training-loop depth: merge SEQUENCES (not just encodings) vs an
# independently-written Sennrich-style reference (arXiv:1508.07909's
# learn_bpe shape: space-joined symbol strings, regex merge application —
# deliberately a different data representation than the engine's tuple
# resegmentation, so a shared bug can't hide).


def _ref_learn_bpe(texts, num_merges, lowercase=True, max_words=50_000):
    import re
    from collections import Counter

    cnt = Counter()
    for t in texts:
        if lowercase:
            t = t.lower()
        for w in t.split():
            cnt[w] += 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]
    vocab = {" ".join(list(w)) + " </w>": c for w, c in top}
    merges = []
    for _ in range(num_merges):
        stats = Counter()
        for word, freq in vocab.items():
            syms = word.split(" ")
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += freq
        if not stats:
            break
        # highest frequency; ties -> lexicographically LARGEST pair
        # (the engine's max(..., key=(freq, pair)) tie-break)
        best = max(stats, key=lambda p: (stats[p], p))
        pat = re.compile(
            r"(?<!\S)" + re.escape(" ".join(best)) + r"(?!\S)"
        )
        repl = "".join(best)
        vocab = {pat.sub(repl, word): c for word, c in vocab.items()}
        merges.append(best)
    return merges


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.data())
def test_bpe_train_merge_sequence_parity(spark, data):
    """train_bpe's learned merge SEQUENCE is identical to the reference
    learner over tie-heavy random corpora (tiny alphabets force massive
    pair-frequency ties, so this pins the (freq, pair) tie-break and the
    resegmentation, not just final encodings), including the top
    ``max_words`` cutoff boundary."""
    from tsflex_spark.datapipe.bpe import train_bpe

    alphabet = data.draw(
        st.sampled_from(["ab", "abc", "xy", "aab"]), label="alphabet"
    )
    words = data.draw(
        st.lists(
            st.text(alphabet=alphabet, min_size=1, max_size=6),
            min_size=3,
            max_size=40,
        ),
        label="words",
    )
    docs = data.draw(st.integers(1, 4), label="docs")
    num_merges = data.draw(st.integers(1, 25), label="num_merges")
    max_words = data.draw(
        st.sampled_from([3, 5, 10, 50_000]), label="max_words"
    )
    texts = [
        " ".join(words[i::docs]) for i in range(docs) if words[i::docs]
    ]
    sdf = spark.createDataFrame(pd.DataFrame({"text": texts}))
    tok = train_bpe(
        sdf, "text", num_merges=num_merges, max_words=max_words
    )
    expected = _ref_learn_bpe(
        texts, num_merges, lowercase=True, max_words=max_words
    )
    assert tok.merges == expected
    # the derived artifact round-trips and encodes consistently
    from tsflex_spark.datapipe.bpe import BPETokenizer

    back = BPETokenizer.from_json(tok.to_json())
    sample = " ".join(words[:5])
    assert back.encode_text(sample) == tok.encode_text(sample)
