"""Distributed embedding toolbox: normalization, PCA, random projection,
int8 quantization, per-dimension statistics.

The missing substrate between raw ``array<float>`` embedding columns and
the similarity/dedup consumers (`datapipe/similarity.py`,
`datapipe/dedup.py`): reduce dimensionality before ANN indexing, whiten
before cosine thresholds, quantize before writing a 100 TB corpus back
out, and monitor per-dimension drift.

Scale design (the 100 TB story):

- **Training passes** (``pca_train``, ``embedding_stats``) reduce the
  corpus to per-partition moment rows via ``mapInPandas`` — each task
  emits ONE row of (n, Σx, Σxxᵀ / Σx²); the driver merges
  O(num_partitions) tiny rows and eigendecomposes a d×d matrix. The
  corpus itself never shuffles and never leaves the executors.
- **Transform passes** (``pca_transform``, ``random_projection``,
  ``l2_normalize``, ``quantize_int8``) are narrow ``mapInPandas``
  stages: the model rides the task closure (d×k doubles), one BLAS
  matmul / numpy pass per Arrow batch, zero shuffles.
- **Determinism**: PCA components use a fixed sign convention (the
  largest-|loading| coordinate is made positive) and the random
  projection matrix is derived from an explicit seed — retraining on a
  re-partitioned corpus reproduces the same model to float tolerance,
  and transforms are bit-stable across executors.

Per-element Catalyst lambdas (``F.transform``/``F.aggregate``) are
interpreted per element (see NOTES_DEV perf lesson); every kernel here
is a vectorized numpy pass over Arrow batches instead.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------- helpers
def _other_cols(df: DataFrame, vec_col: str) -> list:
    return [c for c in df.columns if c != vec_col]


def _stack(series: pd.Series, dim: Optional[int] = None) -> np.ndarray:
    """Arrow list column -> (n, d) float64 matrix."""
    m = np.asarray(series.tolist(), dtype="float64")
    if dim is not None and m.shape[1] != dim:
        raise ValueError(f"embedding dim {m.shape[1]} != model dim {dim}")
    return m


# ---------------------------------------------------- moment reductions
def _moment_partials(
    df: DataFrame, vec_col: str, with_outer: bool
) -> "list[tuple[int, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]":
    """One (n, Σx, Σx² or Σxxᵀ, min, max) row per partition.

    The only driver transfer is O(num_partitions · d²) floats — at 1000
    executors and d=1024 that is ~8 GB for full covariance, so callers
    needing only per-dim stats pass ``with_outer=False`` (O(parts · d)).
    """

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = m2 = mn = mx = None
        for pdf in batches:
            if pdf.empty:
                continue
            X = _stack(pdf[vec_col])
            n += X.shape[0]
            bs = X.sum(axis=0)
            bm2 = (X.T @ X).ravel() if with_outer else (X * X).sum(axis=0)
            bmn, bmx = X.min(axis=0), X.max(axis=0)
            if s is None:
                s, m2, mn, mx = bs, bm2, bmn, bmx
            else:
                s += bs
                m2 += bm2
                mn = np.minimum(mn, bmn)
                mx = np.maximum(mx, bmx)
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "m2": [m2.tolist()],
                    "mn": [mn.tolist()],
                    "mx": [mx.tolist()],
                }
            )

    rows = (
        df.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .mapInPandas(
            part,
            "n long, s array<double>, m2 array<double>, "
            "mn array<double>, mx array<double>",
        )
        .collect()  # O(num_partitions) rows — the corpus never moves
    )
    return [
        (
            r["n"],
            np.asarray(r["s"]),
            np.asarray(r["m2"]),
            np.asarray(r["mn"]),
            np.asarray(r["mx"]),
        )
        for r in rows
    ]


def embedding_stats(df: DataFrame, vec_col: str = "embedding") -> pd.DataFrame:
    """Per-dimension (mean, std_pop, min, max) in ONE narrow pass.

    Returns a d-row pandas frame ``(dim, mean, std, min, max)`` — the
    normalization / drift-monitoring companion to ``utils/drift.py``.
    """
    parts = _moment_partials(df, vec_col, with_outer=False)
    if not parts:
        return pd.DataFrame(columns=["dim", "mean", "std", "min", "max"])
    n = sum(p[0] for p in parts)
    s = np.sum([p[1] for p in parts], axis=0)
    m2 = np.sum([p[2] for p in parts], axis=0)
    mn = np.min([p[3] for p in parts], axis=0)
    mx = np.max([p[4] for p in parts], axis=0)
    mean = s / n
    var = np.maximum(m2 / n - mean * mean, 0.0)
    return pd.DataFrame(
        {
            "dim": np.arange(len(mean)),
            "mean": mean,
            "std": np.sqrt(var),
            "min": mn,
            "max": mx,
        }
    )


# ------------------------------------------------------------------- PCA
class PCAModel:
    """mean (d,), components (k, d) — rows are principal axes sorted by
    descending explained variance (population covariance eigenvalues).

    Sign convention: each component's largest-|loading| coordinate is
    positive, so training is reproducible across partitionings and
    library versions (eigenvector sign is otherwise arbitrary).
    """

    def __init__(self, mean, components, explained_variance, vec_col: str = "embedding"):
        self.mean = np.asarray(mean, dtype="float64")
        self.components = np.asarray(components, dtype="float64")
        self.explained_variance = np.asarray(explained_variance, dtype="float64")
        self.vec_col = vec_col

    @property
    def k(self) -> int:
        return self.components.shape[0]

    @property
    def dim(self) -> int:
        return self.components.shape[1]

    def save(self, path: str) -> None:
        np.savez(
            path if path.endswith(".npz") else path + ".npz",
            mean=self.mean,
            components=self.components,
            explained_variance=self.explained_variance,
            vec_col=np.array(self.vec_col),
        )

    @staticmethod
    def load(path: str) -> "PCAModel":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        return PCAModel(
            z["mean"], z["components"], z["explained_variance"], str(z["vec_col"])
        )


def _sign_fix(components: np.ndarray) -> np.ndarray:
    flip = np.sign(components[np.arange(components.shape[0]), np.abs(components).argmax(axis=1)])
    flip[flip == 0] = 1.0
    return components * flip[:, None]


def pca_train(df: DataFrame, k: int, vec_col: str = "embedding") -> PCAModel:
    """Exact population-covariance PCA in one distributed pass.

    Per-partition (n, Σx, Σxxᵀ) moments → driver merge → d×d ``eigh``.
    Exact (not sketched): the reduction is associative and the corpus is
    read once with no shuffle. d is bounded by what a d×d matrix costs
    on the driver (d=4096 → 128 MB), not by corpus size.
    """
    parts = _moment_partials(df, vec_col, with_outer=True)
    if not parts:
        raise ValueError("pca_train: no non-null vectors")
    n = sum(p[0] for p in parts)
    s = np.sum([p[1] for p in parts], axis=0)
    outer = np.sum([p[2] for p in parts], axis=0)
    d = len(s)
    if not 1 <= k <= d:
        raise ValueError(f"k={k} out of range for dim {d}")
    mean = s / n
    cov = outer.reshape(d, d) / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # symmetrize away float drift
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    return PCAModel(mean, _sign_fix(v[:, order].T), np.maximum(w[order], 0.0), vec_col)


def pca_transform(
    df: DataFrame,
    model: PCAModel,
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Project onto the principal axes: ``(x - mean) @ componentsᵀ``.

    Narrow ``mapInPandas`` — the (k, d) matrix rides the closure, one
    BLAS matmul per Arrow batch, no shuffle. ``whiten=True`` divides by
    ``sqrt(explained_variance)`` so output dims have unit variance on
    the training distribution (the right space for euclidean ANN).
    """
    keep = _other_cols(df, model.vec_col)
    if out_col in keep:
        raise ValueError(f"out_col {out_col!r} already exists")
    W = model.components
    mu = model.mean
    scale = 1.0 / np.sqrt(model.explained_variance + eps) if whiten else None
    out_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = _stack(pdf[model.vec_col], dim=W.shape[1])
            Y = (X - mu) @ W.T
            if scale is not None:
                Y = Y * scale
            out = pdf.copy()
            out[out_col] = list(Y)
            yield out

    return df.mapInPandas(part, f"{out_fields}, `{out_col}` array<double>")


# --------------------------------------------------- random projection
def random_projection(
    df: DataFrame,
    out_dim: int,
    seed: int = 7,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss Gaussian projection to ``out_dim`` dims.

    The (out_dim, d) matrix is derived from the seed on each executor
    (no broadcast, no training pass) and scaled by 1/sqrt(out_dim) so
    euclidean distances are preserved in expectation. The zero-shuffle
    alternative to PCA when no training pass is affordable.
    """
    keep = _other_cols(df, vec_col)
    if out_col in keep:
        raise ValueError(f"out_col {out_col!r} already exists")
    out_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        R = None
        for pdf in batches:
            if pdf.empty:
                continue
            X = _stack(pdf[vec_col])
            if R is None:
                rng = np.random.default_rng(seed)
                R = rng.standard_normal((out_dim, X.shape[1])) / np.sqrt(out_dim)
            Y = X @ R.T
            out = pdf.copy()
            out[out_col] = list(Y)
            yield out

    return df.mapInPandas(part, f"{out_fields}, `{out_col}` array<double>")


# -------------------------------------------------------- normalization
def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: Optional[str] = None
) -> DataFrame:
    """Unit-normalize each vector (zero vectors pass through unchanged).

    After this, cosine similarity == dot product — the downstream
    ANN/dedup kernels (`similarity.py`, `dedup.semantic_dedup`) skip
    their per-row norm. Narrow Arrow pass, no shuffle.
    """
    dst = out_col or vec_col
    if out_col is not None and out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists")
    replace = dst == vec_col
    fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema]
    if not replace:
        fields.append(f"`{dst}` array<float>")
    out_fields = ", ".join(fields)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = _stack(pdf[vec_col])
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            out = pdf.copy()
            out[dst] = list((X / norms).astype("float32"))
            yield out

    return df.mapInPandas(part, out_fields)


# ---------------------------------------------------------- quantization
def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_cols: Tuple[str, str] = ("q", "q_scale"),
) -> DataFrame:
    """Per-vector symmetric int8 quantization: 4×(float32)/8×(float64)
    smaller storage for ANN corpora written back out at 100 TB.

    Emits ``q array<tinyint>`` plus one float ``q_scale`` per row with
    ``x ≈ q * q_scale``; scale = max|x|/127 (all-zero vectors get
    scale 0). Max absolute reconstruction error is scale/2 per element.
    """
    q_col, s_col = out_cols
    for c in out_cols:
        if c in df.columns:
            raise ValueError(f"out_col {c!r} already exists")
    out_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = _stack(pdf[vec_col])
            amax = np.abs(X).max(axis=1)
            scale = amax / 127.0
            safe = np.where(scale == 0.0, 1.0, scale)
            Q = np.clip(np.rint(X / safe[:, None]), -127, 127).astype("int8")
            out = pdf.copy()
            out[q_col] = list(Q)
            out[s_col] = scale.astype("float32")
            yield out

    return df.mapInPandas(
        part, f"{out_fields}, `{q_col}` array<tinyint>, `{s_col}` float"
    )


def dequantize_int8(
    df: DataFrame,
    q_col: str = "q",
    scale_col: str = "q_scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of ``quantize_int8``: ``q * scale`` back to array<float>."""
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists")
    out_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            Q = np.asarray(pdf[q_col].tolist(), dtype="float64")
            scale = pdf[scale_col].to_numpy(dtype="float64")
            out = pdf.copy()
            out[out_col] = list((Q * scale[:, None]).astype("float32"))
            yield out

    return df.mapInPandas(part, f"{out_fields}, `{out_col}` array<float>")


# ------------------------------------------------------------- k-means
def kmeans_fit(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    iters: int = 10,
    seed: int = 7,
    init_sample: int = 4096,
    tol: float = 1e-6,
    sample_fraction: Optional[float] = None,
    init_centroids: Optional[np.ndarray] = None,
):
    """Distributed Lloyd k-means over the FULL corpus (the scale-correct
    refinement of ``similarity.ivf_train``'s bounded-sample trainer).

    Each iteration is one job: a narrow Arrow pass assigns every vector
    to its nearest centroid and emits per-partition partial sums
    (cell → (count, Σx)); the shuffle carries at most k rows per
    partition — never the vectors. The driver merges k tiny rows,
    recomputes centroids, and stops early when no centroid moves more
    than ``tol``. Initialization is a seeded sample (deterministic given
    seed + data), so refits reproduce.

    Sampling contract matches ``similarity.ivf_train``: the default
    ``limit(init_sample)`` pull reads the FIRST partitions — on a corpus
    whose layout correlates with content (sorted by source/topic/time)
    the D² seeding under-covers later regions even though Lloyd then
    refines on the full corpus. Pass ``sample_fraction`` for a
    partition-spanning Bernoulli seed sample (one scan, layout-unbiased).

    Returns ``(centroids ndarray (k, d), inertia float)`` — wrap in
    ``similarity.IVFIndex(centroids)`` to reuse the IVF write/search
    machinery on the refined cells.

    ``init_centroids`` (a (k, d) array) skips the sampling + D² seeding
    entirely — warm restarts from a previous fit, or an externally
    chosen deterministic init (e.g. for cross-engine verification).
    """
    if init_centroids is not None:
        C = np.asarray(init_centroids, dtype="float64").copy()
        assert C.shape[0] == k, f"init_centroids has {C.shape[0]} rows, k={k}"
    else:
        seed_src = df.select(vec_col).where(F.col(vec_col).isNotNull())
        if sample_fraction is not None:
            # the fraction IS the budget: a limit() on top would re-bias
            init = seed_src.sample(False, float(sample_fraction), seed).toPandas()
        else:
            init = seed_src.limit(init_sample).toPandas()
        X0 = np.asarray(init[vec_col].tolist(), dtype="float64")
        if len(X0) < k:
            raise ValueError(f"fewer non-null vectors ({len(X0)}) than k={k}")
        # k-means++ D² seeding on the sample (Arthur & Vassilvitskii
        # 2007): plain random init routinely drops a well-separated
        # cluster
        rng = np.random.default_rng(seed)
        xx = (X0 * X0).sum(1)
        C = X0[rng.integers(len(X0))][None, :].copy()
        best_d2 = np.full(len(X0), np.inf)
        for _ in range(1, k):
            new = C[-1]
            d2 = np.maximum(xx - 2.0 * (X0 @ new) + (new * new).sum(), 0.0)
            best_d2 = np.minimum(best_d2, d2)
            tot = best_d2.sum()
            probs = best_d2 / tot if tot > 0 else np.full(len(X0), 1.0 / len(X0))
            C = np.vstack([C, X0[rng.choice(len(X0), p=probs)]])

    src = df.select(vec_col).where(F.col(vec_col).isNotNull())
    inertia = float("nan")
    for _ in range(iters):
        Cb = C.copy()

        def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cnt = np.zeros(len(Cb), dtype="int64")
            sums = np.zeros_like(Cb)
            sse = 0.0
            norms = (Cb**2).sum(1)
            for pdf in batches:
                if pdf.empty:
                    continue
                X = _stack(pdf[vec_col])
                d2 = -2.0 * (X @ Cb.T) + norms[None, :]
                a = d2.argmin(1)
                sse += float((d2[np.arange(len(X)), a] + (X * X).sum(1)).sum())
                np.add.at(cnt, a, 1)
                np.add.at(sums, a, X)
            nz = np.flatnonzero(cnt)
            if len(nz):
                yield pd.DataFrame(
                    {
                        "cell": nz,
                        "cnt": cnt[nz],
                        "s": [sums[j].tolist() for j in nz],
                        "sse": [sse] + [0.0] * (len(nz) - 1),
                    }
                )

        parts = src.mapInPandas(
            part, "cell int, cnt long, s array<double>, sse double"
        ).collect()
        cnt = np.zeros(k, dtype="int64")
        sums = np.zeros_like(C)
        inertia = 0.0
        for r in parts:
            cnt[r["cell"]] += r["cnt"]
            sums[r["cell"]] += np.asarray(r["s"])
            inertia += r["sse"]
        moved = 0.0
        for j in range(k):
            if cnt[j]:
                nc = sums[j] / cnt[j]
                moved = max(moved, float(((nc - C[j]) ** 2).sum()))
                C[j] = nc
        if moved <= tol:
            break
    return C, inertia
