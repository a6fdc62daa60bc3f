"""Product quantization: codebook training, encoding, ADC search."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsflex_spark.datapipe import similarity as S


@pytest.fixture(scope="module")
def pq_pdf():
    rng = np.random.default_rng(3)
    # clustered data so quantization error is meaningfully below variance
    centers = rng.standard_normal((8, 16)) * 4.0
    X = centers[rng.integers(0, 8, 600)] + rng.standard_normal((600, 16)) * 0.3
    return pd.DataFrame(
        {
            "vec_id": np.arange(600, dtype="int64"),
            "embedding": [r.astype("float32") for r in X],
        }
    )


@pytest.fixture(scope="module")
def pq_sdf(spark, pq_pdf):
    return spark.createDataFrame(pq_pdf)


def _X(pdf):
    return np.asarray(pdf["embedding"].tolist(), dtype="float64")


def test_pq_train_shapes_and_determinism(pq_sdf):
    cb1 = S.pq_train(pq_sdf, m=4, ksub=16)
    cb2 = S.pq_train(pq_sdf.repartition(1), m=4, ksub=16)
    assert cb1.codebooks.shape == (4, 16, 4)
    assert cb1.m == 4 and cb1.ksub == 16 and cb1.dim == 16
    # limit() sample on one partition == same rows -> identical books
    np.testing.assert_allclose(cb1.codebooks, cb2.codebooks)


def test_pq_assign_codes_and_reconstruction(pq_sdf, pq_pdf):
    cb = S.pq_train(pq_sdf, m=4, ksub=16)
    coded = S.pq_assign(pq_sdf, cb).orderBy("vec_id").toPandas()
    codes = np.stack(coded["pq_code"].to_numpy())
    assert codes.dtype == np.int16 or codes.dtype == np.int64
    assert codes.min() >= 0 and codes.max() < 16
    # reconstruction error well under data variance (clustered data)
    X = _X(pq_pdf)
    recon = np.concatenate(
        [cb.codebooks[s][codes[:, s]] for s in range(cb.m)], axis=1
    )
    mse = ((X - recon) ** 2).mean()
    var = X.var()
    assert mse < 0.25 * var


def test_pq_search_recall_vs_exact(pq_sdf, pq_pdf):
    cb = S.pq_train(pq_sdf, m=8, ksub=32)
    coded = S.pq_assign(pq_sdf, cb).select("vec_id", "pq_code")
    X = _X(pq_pdf)
    q = X[17] + 0.01
    got = S.pq_search(coded, cb, q, k=50).toPandas()
    assert list(got.columns) == ["vec_id", "approx_dist"]
    assert (got["approx_dist"].to_numpy() >= 0).all()
    assert got["approx_dist"].is_monotonic_increasing
    # standard PQ metric: recall@R with R > k — within a tight cluster the
    # codes tie, so exact top-10 membership in the approx top-50 is the
    # meaningful contract (ADC must at least keep the right cluster)
    exact = np.argsort(((X - q[None, :]) ** 2).sum(1))[:10]
    recall = len(set(got["vec_id"]) & set(exact.tolist())) / 10
    assert recall >= 0.8


def test_pq_roundtrip_persistence(tmp_path, pq_sdf):
    cb = S.pq_train(pq_sdf, m=2, ksub=8)
    p = str(tmp_path / "pq")
    cb.save(p)
    back = S.PQCodebook.load(p)
    np.testing.assert_array_equal(cb.codebooks, back.codebooks)
    assert back.vec_col == "embedding" and back.id_col == "vec_id"


def test_pq_dim_validation(pq_sdf):
    with pytest.raises(ValueError, match="not divisible"):
        S.pq_train(pq_sdf, m=5, ksub=8)
    cb = S.pq_train(pq_sdf, m=4, ksub=8)
    with pytest.raises(ValueError, match="query dim"):
        S.pq_search(pq_sdf, cb, [0.0] * 7)


def test_ivfpq_search_composes(spark, pq_sdf, pq_pdf):
    from tsflex_spark.datapipe import similarity as S2

    idx = S2.ivf_train(pq_sdf, nlist=8)
    cb = S2.pq_train(pq_sdf, m=8, ksub=32)
    enc = S2.pq_assign(S2.ivf_assign(pq_sdf, idx), cb).select(
        "vec_id", "__cell", "pq_code"
    )
    X = _X(pq_pdf)
    q = X[42] + 0.01
    # all-cells probe == plain pq_search (partition completeness)
    full = S2.ivfpq_search(enc, idx, cb, q, k=20, nprobe=idx.nlist).toPandas()
    plain = S2.pq_search(enc.drop("__cell"), cb, q, k=20).toPandas()
    assert full["vec_id"].tolist() == plain["vec_id"].tolist()
    # pruned probe returns a subset drawn only from probed cells
    pruned = S2.ivfpq_search(enc, idx, cb, q, k=10, nprobe=2).toPandas()
    probed = set(S2.probe_cells(idx, q, 2))
    cells = {
        r["__cell"]
        for r in enc.join(
            spark.createDataFrame(pruned[["vec_id"]]), "vec_id"
        ).collect()
    }
    assert cells <= probed
    assert len(pruned) == 10
