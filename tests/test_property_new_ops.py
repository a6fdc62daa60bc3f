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
