"""The entry file's oracle-replication helpers are verification assets:
`_xxh64_pmod_steps` reimplements Spark's xxhash64 in DuckDB SQL and
`_pagerank_cte_chain` unrolls graph.pagerank's power iteration. The
gates exercise them on one fixed corpus; these fuzzes pin them over
random inputs — ids across the full int64 range (sign handling, high
bits) and random digraphs (dangling nodes, self-structure, multi-edges).
"""

import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from tsflex_spark.utils.xxh import hash_int, hash_long


def _pmod_py(doc_id: int, seed: int) -> int:
    h = hash_int(seed, hash_long(doc_id, 42))
    signed = h - (1 << 64) if h >= (1 << 63) else h
    return ((signed % 1_000_000) + 1_000_000) % 1_000_000


def test_xxh64_sql_chain_fuzz():
    """DuckDB chain == python xxh (itself Catalyst-parity-tested in
    test_xxh.py) over random int64 ids and int32 seeds, plus edges."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    def check(ids, seed):
        steps = entry_mod._xxh64_pmod_steps("t", "doc_id", seed, "b")
        chain = entry_mod._xxh64_cte_chain("b0", steps, "x")
        vals = ", ".join(str(i) for i in ids)
        sql = (
            f"WITH b0 AS (SELECT unnest([{vals}]::BIGINT[]) AS doc_id), "
            f"{chain} SELECT doc_id, b FROM x_fin"
        )
        for doc_id, got in con.execute(sql).fetchall():
            assert got == _pmod_py(doc_id, seed), (doc_id, seed)

    # deterministic edge battery: extremes, sign boundary, small values
    check(
        [0, 1, -1, 2**63 - 1, -(2**63), 2**32, -(2**32), 42, -42],
        7,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        ids=st.lists(
            st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=8
        ),
        seed=st.integers(-(2**31), 2**31 - 1),
    )
    def prop(ids, seed):
        check(ids, seed)

    prop()


def test_xxh64_str_sql_fuzz():
    """The general STRING replication (_xxh64_str_cte: recursive-CTE
    XXH64 stripes + word/4-byte/byte tails) == python hash_bytes
    (Catalyst-parity-tested in test_xxh.py) over random ASCII strings
    covering every loop-boundary length class."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tsflex_spark.utils.xxh import spark_xxhash64

    con = duckdb.connect()
    con.execute("CREATE TABLE strs (rid BIGINT, s VARCHAR)")

    def check(strings):
        con.execute("DELETE FROM strs")
        con.executemany(
            "INSERT INTO strs VALUES (?, ?)", list(enumerate(strings))
        )
        frag = entry_mod._xxh64_str_cte("strs", "rid", "s", "xh")
        got = dict(
            con.execute(
                f"WITH RECURSIVE {frag} SELECT rid, xh_h FROM xh_out"
            ).fetchall()
        )
        for rid, s in enumerate(strings):
            assert got[rid] == spark_xxhash64(s), (rid, len(s), s)

    # deterministic boundary battery: every tail-combination class
    check(["", "a", "abc", "abcd", "abcdefg", "abcdefgh", "abcdefghi",
           "x" * 15, "y" * 16, "z" * 31, "w" * 32, "v" * 33, "u" * 63,
           "t" * 64, "s" * 65, "r" * 100])

    ascii_safe = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0, max_size=200,
    )

    @settings(max_examples=20, deadline=None)
    @given(strings=st.lists(ascii_safe, min_size=1, max_size=6))
    def prop(strings):
        check(strings)

    prop()


def test_xxh64_gram_steps_fuzz():
    """The unrolled <=3-byte gram chain (_xxh64_gram_steps: bucket +
    sign hash) == python spark_xxhash64 over ASCII grams of length
    0..3 at several dims."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tsflex_spark.utils.xxh import spark_xxhash64

    con = duckdb.connect()
    con.execute("CREATE TABLE grams (g VARCHAR)")

    def check(grams, dim):
        con.execute("DELETE FROM grams")
        con.executemany("INSERT INTO grams VALUES (?)", [(g,) for g in grams])
        chain = entry_mod._xxh64_cte_chain(
            "grams", entry_mod._xxh64_gram_steps("t", "g", dim), "gx"
        )
        rows = con.execute(
            f"WITH {chain} SELECT g, t_bucket, t_sign FROM gx_fin"
        ).fetchall()
        for g, bucket, sign in rows:
            h = spark_xxhash64(g)
            assert bucket == ((h % dim) + dim) % dim, (g, dim)
            s = spark_xxhash64(g, 1)
            assert sign == (1 if ((s % 2) + 2) % 2 == 0 else -1), g

    check(["", "a", "ab", "abc", "  ", "A~z", "0", "zz", "..."], 16)

    ascii3 = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0, max_size=3,
    )

    @settings(max_examples=20, deadline=None)
    @given(grams=st.lists(ascii3, min_size=1, max_size=10, unique=True),
           dim=st.sampled_from([2, 16, 64, 128]))
    def prop(grams, dim):
        check(grams, dim)

    prop()


def test_pagerank_sql_chain_fuzz(spark):
    """DuckDB unrolled chain == datapipe.graph.pagerank on random
    digraphs (dangling nodes arise whenever a dst never appears as src;
    duplicate edges count as parallel links in both)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from tsflex_spark.datapipe.graph import pagerank

    con = duckdb.connect()
    ITERS, D = 5, 0.85

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 12), st.integers(0, 12)),
            min_size=1,
            max_size=40,
        )
    )
    def prop(edges):
        sdf = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["rank"]
            for r in pagerank(sdf, "src", "dst", damping=D, iters=ITERS).collect()
        }
        rows = ", ".join(f"({s}, {d})" for s, d in edges)
        sql = (
            f"WITH de AS MATERIALIZED (SELECT * FROM (VALUES {rows}) t(src, dst)), "
            + entry_mod._pagerank_cte_chain(ITERS, D)
            + f" SELECT node, rank FROM pr{ITERS}"
        )
        exp = dict(con.execute(sql).fetchall())
        assert set(got) == set(exp)
        for n in got:
            assert abs(got[n] - exp[n]) < 1e-9, (n, got[n], exp[n])
        # Σrank == 1 (mass conservation incl. dangling redistribution)
        assert abs(sum(got.values()) - 1.0) < 1e-9

    prop()


def test_kmeans_sql_chain_fuzz(spark):
    """DuckDB unrolled Lloyd chain == embedding.kmeans_fit(init_centroids=)
    on random low-dim vector sets — pins the assignment argmin tie-break,
    per-dimension mean update, empty-cell keep-old rule, and the fresh
    final counts/inertia pass."""
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from tsflex_spark.datapipe.embedding import kmeans_fit

    K, ITERS, DIM = 3, 3, 4

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vals=st.lists(
            st.lists(
                st.floats(min_value=-5, max_value=5, allow_nan=False, width=16),
                min_size=DIM,
                max_size=DIM,
            ),
            min_size=K + 1,
            max_size=25,
        )
    )
    def prop(vals):
        X = np.asarray([[float(x) for x in v] for v in vals], dtype="float64")
        pdf = pd.DataFrame(
            {"vec_id": np.arange(1, len(X) + 1), "embedding": [list(v) for v in X]}
        )
        sdf = spark.createDataFrame(pdf)
        C0 = X[:K].copy()  # k smallest vec_ids = first k rows
        C, _ = kmeans_fit(
            sdf, K, "embedding", iters=ITERS, tol=0.0, init_centroids=C0
        )
        # fresh assignment (the gate's pass)
        norms = (C**2).sum(1)
        d2 = -2.0 * (X @ C.T) + norms[None, :]
        a = d2.argmin(1)
        cnt = np.bincount(a, minlength=K)
        inertia = float((d2[np.arange(len(X)), a] + (X * X).sum(1)).sum())

        con = duckdb.connect()
        con.register("embeddings", pdf)
        sql = (
            "WITH "
            + entry_mod._kmeans_cte_chain(k=K, iters=ITERS)
            + " SELECT * FROM km ORDER BY vec_id"
        )
        rows = con.execute(sql).fetchall()
        got = {r[1]: (r[2], r[3]) for r in rows}
        assert got[-1][1] == len(X)
        assert abs(got[-1][0] - inertia) < 1e-7 * max(1.0, abs(inertia))
        for j in range(K):
            norm_j, n_j = got[j]
            assert n_j == cnt[j], (j, n_j, cnt[j])
            assert abs(norm_j - float((C[j] ** 2).sum())) < 1e-9, j

    prop()


def test_xxh64_str_cte_nonascii_guard():
    """The string-hash oracle hard-errors (naming the rid) on non-ASCII
    input instead of silently hashing wrong bytes — the byte==codepoint
    identity it relies on only holds for ASCII (round-8 ADVICE fix)."""
    import pytest

    con = duckdb.connect()
    con.execute("CREATE TABLE strs (rid BIGINT, s VARCHAR)")
    con.execute("INSERT INTO strs VALUES (0, 'plain ascii'), (7, 'café')")
    frag = entry_mod._xxh64_str_cte("strs", "rid", "s", "xh")
    with pytest.raises(Exception, match="non-ASCII.*rid=7"):
        con.execute(
            f"WITH RECURSIVE {frag} SELECT rid, xh_h FROM xh_out"
        ).fetchall()
    # ascii-only input still hashes
    con.execute("DELETE FROM strs WHERE rid = 7")
    rows = con.execute(
        f"WITH RECURSIVE {frag} SELECT rid, xh_h FROM xh_out"
    ).fetchall()
    assert len(rows) == 1
