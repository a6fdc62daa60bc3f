import numpy as np
import pytest
from pyspark.sql import functions as F

from tsflex_spark.datapipe.curation import cluster_assign_with_sim, cluster_sample
from tsflex_spark.datapipe.similarity import IVFIndex


def _toy(spark):
    """Three well-separated 2-D Gaussian blobs with unequal sizes."""
    rng = np.random.default_rng(5)
    centers = np.array([[10.0, 0.0], [0.0, 10.0], [-10.0, -10.0]])
    sizes = [40, 20, 8]
    rows = []
    i = 0
    for c, n in zip(centers, sizes):
        for _ in range(n):
            v = c + rng.normal(0, 1.0, 2)
            rows.append((i, [float(v[0]), float(v[1])]))
            i += 1
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        centers,
        sizes,
    )


def test_cluster_assign_matches_numpy(spark):
    df, centers, sizes = _toy(spark)
    idx = IVFIndex(centers, vec_col="embedding", id_col="vec_id")
    out = cluster_assign_with_sim(df, idx).collect()
    X = {r["vec_id"]: np.asarray(r["embedding"]) for r in df.collect()}
    for r in out:
        x = X[r["vec_id"]]
        d2 = ((centers - x[None, :]) ** 2).sum(1)
        assert r["__cell"] == int(d2.argmin())
        c = centers[r["__cell"]]
        sim = float(x @ c / (np.linalg.norm(x) * np.linalg.norm(c)))
        assert r["__proto_sim"] == pytest.approx(sim, rel=1e-9)


def test_prototypical_keeps_most_typical(spark):
    df, centers, sizes = _toy(spark)
    idx = IVFIndex(centers, vec_col="embedding", id_col="vec_id")
    kept = cluster_sample(
        df, "vec_id", keep_frac=0.5, strategy="prototypical", index=idx
    )
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    scored = {
        r["vec_id"]: (r["__cell"], r["__proto_sim"])
        for r in cluster_assign_with_sim(df, idx).collect()
    }
    # per cell: every kept row's sim >= every dropped row's sim
    for cell in range(3):
        ks = [s for i, (c, s) in scored.items() if c == cell and i in kept_ids]
        ds = [s for i, (c, s) in scored.items() if c == cell and i not in kept_ids]
        assert ks and ds
        assert min(ks) >= max(ds)
        n_cell = sum(1 for c, _ in scored.values() if c == cell)
        assert len(ks) == int(np.ceil(n_cell * 0.5))


def test_diverse_keeps_least_typical(spark):
    df, centers, _ = _toy(spark)
    idx = IVFIndex(centers, vec_col="embedding", id_col="vec_id")
    kept = cluster_sample(
        df, "vec_id", keep_frac=0.25, strategy="diverse", index=idx
    )
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    scored = {
        r["vec_id"]: (r["__cell"], r["__proto_sim"])
        for r in cluster_assign_with_sim(df, idx).collect()
    }
    for cell in range(3):
        ks = [s for i, (c, s) in scored.items() if c == cell and i in kept_ids]
        ds = [s for i, (c, s) in scored.items() if c == cell and i not in kept_ids]
        assert max(ks) <= min(ds)


def test_balanced_budget_equalizes(spark):
    df, centers, sizes = _toy(spark)
    idx = IVFIndex(centers, vec_col="embedding", id_col="vec_id")
    kept = cluster_sample(
        df, "vec_id", per_cell_budget=10, strategy="balanced", index=idx
    )
    out = cluster_assign_with_sim(kept, idx).groupBy("__cell").count().collect()
    counts = {r["__cell"]: r["count"] for r in out}
    # 40 → 10, 20 → 10, 8 → all 8
    assert counts[0] == 10 and counts[1] == 10 and counts[2] == 8
    # original columns come back unchanged
    assert set(kept.columns) == {"vec_id", "embedding"}


def test_cluster_sample_trains_when_no_index(spark):
    df, _, _ = _toy(spark)
    kept = cluster_sample(df, "vec_id", keep_frac=0.5, num_cells=3)
    n = kept.count()
    assert 30 <= n <= 40  # ceil per cell: between half and a bit over


def test_cluster_sample_arg_validation(spark):
    df, centers, _ = _toy(spark)
    idx = IVFIndex(centers, vec_col="embedding", id_col="vec_id")
    with pytest.raises(ValueError):
        cluster_sample(df, "vec_id", index=idx)
    with pytest.raises(ValueError):
        cluster_sample(df, "vec_id", keep_frac=0.5, per_cell_budget=3, index=idx)
    with pytest.raises(ValueError):
        cluster_sample(df, "vec_id", keep_frac=0.5, strategy="nope", index=idx)


def test_cluster_sample_deterministic(spark):
    df, centers, _ = _toy(spark)
    idx = IVFIndex(centers, vec_col="embedding", id_col="vec_id")
    a = {r["vec_id"] for r in cluster_sample(df.repartition(1), "vec_id", keep_frac=0.4, index=idx).collect()}
    b = {r["vec_id"] for r in cluster_sample(df.repartition(6), "vec_id", keep_frac=0.4, index=idx).collect()}
    assert a == b


def test_ivf_train_sample_fraction_covers_late_partitions(spark):
    """With a layout where one cluster lives entirely in the LAST
    partitions, the limit() sample misses it but the Bernoulli sample
    covers it."""
    import numpy as np

    from tsflex_spark.datapipe.similarity import ivf_train

    near = [(i, [0.0 + 0.01 * (i % 7), 0.0]) for i in range(2000)]
    far = [(10_000 + i, [100.0, 100.0 + 0.01 * (i % 7)]) for i in range(2000)]
    # repartition(1) after a union keeps input order → far rows sit late
    df = spark.createDataFrame(
        near + far, "vec_id long, embedding array<double>"
    ).coalesce(1)
    idx_biased = ivf_train(df, nlist=2, sample_per_centroid=500)
    idx_fair = ivf_train(df, nlist=2, sample_fraction=0.1)
    # fair sample: one centroid lands near (100, 100)
    d_far_fair = min(
        float(((c - np.array([100.0, 100.0])) ** 2).sum()) for c in idx_fair.centroids
    )
    d_far_biased = min(
        float(((c - np.array([100.0, 100.0])) ** 2).sum()) for c in idx_biased.centroids
    )
    assert d_far_fair < 100.0      # covered
    assert d_far_biased > 1000.0   # limit() never saw the far cluster
