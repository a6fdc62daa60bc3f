"""PageRank + degrees: numpy power-iteration parity, dangling mass."""

import numpy as np
import pandas as pd
import pytest

from tsflex_spark.datapipe.graph import degrees, pagerank


def _np_pagerank(edge_list, nodes, damping=0.85, iters=20):
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    out_deg = np.zeros(n)
    for s, d in edge_list:
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dangling = r[out_deg == 0].sum()
        for s, d in edge_list:
            nxt[idx[d]] += r[idx[s]] / out_deg[idx[s]]
        r = (1 - damping) / n + damping * dangling / n + damping * nxt
    return {v: r[idx[v]] for v in nodes}


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "c"),  # duplicate edge = weight 2
    ("e", "a"),
    # f is dangling (in-edges only)
    ("a", "f"),
]
NODES = ["a", "b", "c", "d", "e", "f"]


@pytest.fixture(scope="module")
def edges_sdf(spark):
    return spark.createDataFrame(pd.DataFrame(EDGES, columns=["src", "dst"]))


def test_pagerank_numpy_parity(edges_sdf):
    got = {r["node"]: r["rank"] for r in pagerank(edges_sdf, iters=20).collect()}
    exp = _np_pagerank(EDGES, NODES)
    assert set(got) == set(NODES)
    for v in NODES:
        assert abs(got[v] - exp[v]) < 1e-12, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_hub_ranks_highest(edges_sdf):
    got = {r["node"]: r["rank"] for r in pagerank(edges_sdf, iters=20).collect()}
    # a and c form the cycle that accumulates rank: top-2 of the graph
    top2 = sorted(NODES, key=lambda v: -got[v])[:2]
    assert set(top2) == {"a", "c"}
    # isolated-source e (nothing points to it) gets only the teleport term
    assert got["e"] == min(got[v] for v in NODES)


def test_pagerank_early_stop(edges_sdf):
    full = {r["node"]: r["rank"] for r in pagerank(edges_sdf, iters=50).collect()}
    tol = {r["node"]: r["rank"] for r in pagerank(edges_sdf, iters=50, tol=1e-10).collect()}
    for v in NODES:
        assert abs(full[v] - tol[v]) < 1e-8


def test_degrees(edges_sdf):
    d = {r["node"]: (r["out_degree"], r["in_degree"]) for r in degrees(edges_sdf).collect()}
    assert d["a"] == (3, 2)  # out: b,c,f; in: c,e
    assert d["d"] == (2, 0)
    assert d["f"] == (0, 1)


def test_pagerank_validates_damping(edges_sdf):
    with pytest.raises(ValueError, match="damping"):
        pagerank(edges_sdf, damping=1.5)
