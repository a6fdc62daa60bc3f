"""Embedding toolbox: PCA / random projection / normalize / int8 quantize.

Every training op is checked for numpy parity AND partition independence
(the moment reduction must be associative); every transform op is checked
for numpy parity and a shuffle-free plan.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsflex_spark.datapipe import embedding as E
from tsflex_spark.utils.plans import scale_report


@pytest.fixture(scope="module")
def vec_pdf():
    rng = np.random.default_rng(11)
    # anisotropic data so PCA has a clearly ordered spectrum
    base = rng.standard_normal((400, 16))
    stretch = np.linspace(4.0, 0.25, 16)
    X = base * stretch + rng.standard_normal(16)  # shifted + scaled
    return pd.DataFrame(
        {
            "vec_id": np.arange(400, dtype="int64"),
            "embedding": [r.astype("float32") for r in X],
        }
    )


@pytest.fixture(scope="module")
def vec_sdf(spark, vec_pdf):
    return spark.createDataFrame(vec_pdf)


def _X(pdf):
    return np.asarray(pdf["embedding"].tolist(), dtype="float64")


# ------------------------------------------------------------------- PCA
def _numpy_pca(X, k):
    mean = X.mean(axis=0)
    cov = np.cov(X.T, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comp = v[:, order].T
    flip = np.sign(comp[np.arange(k), np.abs(comp).argmax(axis=1)])
    return mean, comp * flip[:, None], w[order]


def test_pca_train_numpy_parity(vec_sdf, vec_pdf):
    model = E.pca_train(vec_sdf, k=4)
    mean, comp, ev = _numpy_pca(_X(vec_pdf), 4)
    np.testing.assert_allclose(model.mean, mean, atol=1e-9)
    np.testing.assert_allclose(model.explained_variance, ev, rtol=1e-9)
    np.testing.assert_allclose(model.components, comp, atol=1e-8)
    assert np.all(np.diff(model.explained_variance) <= 1e-12)  # descending


def test_pca_train_partition_independent(vec_sdf):
    m1 = E.pca_train(vec_sdf.repartition(1), k=3)
    m7 = E.pca_train(vec_sdf.repartition(7), k=3)
    np.testing.assert_allclose(m1.mean, m7.mean, atol=1e-10)
    np.testing.assert_allclose(m1.components, m7.components, atol=1e-8)


def test_pca_transform_parity_and_plan(vec_sdf, vec_pdf):
    model = E.pca_train(vec_sdf, k=4)
    out = E.pca_transform(vec_sdf, model, out_col="pca")
    pdf = out.orderBy("vec_id").toPandas()
    X = _X(vec_pdf)
    Y_ref = (X - model.mean) @ model.components.T
    Y = np.asarray(pdf["pca"].tolist())
    np.testing.assert_allclose(Y, Y_ref, atol=1e-9)
    # narrow: no exchange in the transform plan
    rep = scale_report(out)
    assert not rep.get("single_partition_exchanges")
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_pca_whiten_unit_variance(vec_sdf):
    model = E.pca_train(vec_sdf, k=5)
    out = E.pca_transform(vec_sdf, model, out_col="w", whiten=True)
    Y = np.asarray(out.select("w").toPandas()["w"].tolist())
    np.testing.assert_allclose(Y.var(axis=0), np.ones(5), rtol=1e-6)


def test_pca_model_roundtrip(tmp_path, vec_sdf):
    model = E.pca_train(vec_sdf, k=2)
    p = str(tmp_path / "pca")
    model.save(p)
    back = E.PCAModel.load(p)
    np.testing.assert_array_equal(model.components, back.components)
    np.testing.assert_array_equal(model.mean, back.mean)
    assert back.vec_col == "embedding"


def test_pca_dim_mismatch_raises(vec_sdf):
    model = E.pca_train(vec_sdf, k=2)
    bad = vec_sdf.withColumn("embedding", F.slice("embedding", 1, 8))
    with pytest.raises(Exception, match="dim"):
        E.pca_transform(bad, model).collect()


# ------------------------------------------------------ random projection
def test_random_projection_deterministic_and_jl(vec_sdf, vec_pdf):
    out = E.random_projection(vec_sdf, out_dim=8, seed=5)
    p1 = out.orderBy("vec_id").toPandas()
    p2 = (
        E.random_projection(vec_sdf.repartition(5), out_dim=8, seed=5)
        .orderBy("vec_id")
        .toPandas()
    )
    Y1 = np.asarray(p1["proj"].tolist())
    Y2 = np.asarray(p2["proj"].tolist())
    np.testing.assert_array_equal(Y1, Y2)  # seed + partitioning stable
    # JL: distances preserved in expectation (loose statistical bound)
    X = _X(vec_pdf)
    rng = np.random.default_rng(0)
    i, j = rng.integers(0, len(X), 50), rng.integers(0, len(X), 50)
    keep = i != j
    dx = np.linalg.norm(X[i[keep]] - X[j[keep]], axis=1)
    dy = np.linalg.norm(Y1[i[keep]] - Y1[j[keep]], axis=1)
    ratio = dy / dx
    assert 0.75 < np.median(ratio) < 1.25


# ------------------------------------------------------------- normalize
def test_l2_normalize(spark):
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [
                np.array([3.0, 4.0], dtype="float32"),
                np.array([0.0, 0.0], dtype="float32"),
                np.array([-1.0, 1.0], dtype="float32"),
            ],
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = E.l2_normalize(sdf).orderBy("vec_id").toPandas()
    X = np.asarray(out["embedding"].tolist(), dtype="float64")
    np.testing.assert_allclose(X[0], [0.6, 0.8], atol=1e-6)
    np.testing.assert_array_equal(X[1], [0.0, 0.0])  # zero passes through
    np.testing.assert_allclose(np.linalg.norm(X[2]), 1.0, atol=1e-6)
    # out_col variant keeps the original column
    out2 = E.l2_normalize(sdf, out_col="unit").orderBy("vec_id").toPandas()
    assert "embedding" in out2 and "unit" in out2
    np.testing.assert_allclose(
        np.asarray(out2["unit"].tolist())[0], [0.6, 0.8], atol=1e-6
    )


# ---------------------------------------------------------- quantization
def test_quantize_roundtrip_error_bound(vec_sdf, vec_pdf):
    q = E.quantize_int8(vec_sdf)
    assert dict(q.dtypes)["q"] == "array<tinyint>"
    back = E.dequantize_int8(q.drop("embedding"), out_col="emb2")
    joined = (
        back.orderBy("vec_id").toPandas()
    )
    X = _X(vec_pdf)
    X2 = np.asarray(joined["emb2"].tolist(), dtype="float64")
    scale = np.abs(X).max(axis=1) / 127.0
    err = np.abs(X - X2).max(axis=1)
    assert np.all(err <= scale / 2 + 1e-6)


def test_quantize_zero_vector(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0], "embedding": [np.zeros(4, dtype="float32")]})
    )
    out = E.quantize_int8(sdf).toPandas()
    assert out["q_scale"][0] == 0.0
    assert list(out["q"][0]) == [0, 0, 0, 0]


# ----------------------------------------------------------------- stats
def test_embedding_stats_numpy_parity(vec_sdf, vec_pdf):
    st = E.embedding_stats(vec_sdf)
    X = _X(vec_pdf)
    np.testing.assert_allclose(st["mean"].to_numpy(), X.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(st["std"].to_numpy(), X.std(axis=0), atol=1e-9)
    np.testing.assert_allclose(st["min"].to_numpy(), X.min(axis=0))
    np.testing.assert_allclose(st["max"].to_numpy(), X.max(axis=0))


# ---------------------------------------------------------------- kmeans
def test_kmeans_recovers_separated_clusters(spark):
    rng = np.random.default_rng(5)
    centers = np.array([[0.0] * 8, [20.0] * 8, [-20.0] * 8])
    X = centers[rng.integers(0, 3, 300)] + rng.standard_normal((300, 8)) * 0.5
    sdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(300, dtype="int64"),
                "embedding": [r.astype("float32") for r in X],
            }
        )
    )
    C, inertia = E.kmeans_fit(sdf, k=3, iters=15, seed=1)
    # each true center has a learned centroid within noise distance
    for c in centers:
        d = np.linalg.norm(C - c[None, :], axis=1).min()
        assert d < 1.0, d
    # inertia ~ n * d * sigma^2 = 300*8*0.25 = 600
    assert inertia < 2 * 600


def test_kmeans_partition_independent(vec_sdf):
    C1, i1 = E.kmeans_fit(vec_sdf.repartition(1), k=4, iters=5, seed=2)
    # different partitioning, same seeded init sample after sort-stability:
    # limit() over one partition is deterministic; compare against coalesce(1)
    C2, i2 = E.kmeans_fit(vec_sdf.coalesce(1), k=4, iters=5, seed=2)
    np.testing.assert_allclose(np.sort(C1, axis=0), np.sort(C2, axis=0), atol=1e-8)
    np.testing.assert_allclose(i1, i2, rtol=1e-9)


def test_kmeans_sample_fraction_unbiased_seeding(spark):
    # layout-correlated corpus: all of cluster A first, then B, then C.
    # limit(init_sample) seeds only from A; fraction sampling spans the
    # layout and the D² seeds cover every cluster.
    rng = np.random.default_rng(9)
    centers = np.array([[0.0] * 6, [30.0] * 6, [-30.0] * 6])
    X = np.vstack([c + rng.standard_normal((100, 6)) * 0.5 for c in centers])
    sdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(300, dtype="int64"),
                "embedding": [r.astype("float32") for r in X],
            }
        )
    ).coalesce(1)  # single partition => limit() truly reads in layout order
    C, _ = E.kmeans_fit(sdf, k=3, iters=15, seed=3, sample_fraction=0.5)
    for c in centers:
        assert np.linalg.norm(C - c[None, :], axis=1).min() < 1.0


def test_kmeans_k_too_large(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame({"embedding": [[1.0, 2.0], [3.0, 4.0]]})
    )
    with pytest.raises(ValueError, match="fewer non-null"):
        E.kmeans_fit(sdf, k=5)
