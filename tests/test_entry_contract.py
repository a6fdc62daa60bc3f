"""Guards on the driver contract in __spark_entry__.py: the query map is
capped at 50 entries, every oracle key has a query, and the module stays
importable without a SparkSession."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_query_count_at_cap():
    q = entry_mod.queries()
    assert len(q) == 50, f"driver caps at 50; have {len(q)}"
    assert all(callable(f) for f in q.values())


def test_oracles_subset_of_queries():
    q = set(entry_mod.queries())
    o = entry_mod.oracle_sql()
    assert set(o) <= q, set(o) - q
    # every oracle is a non-trivial SQL string
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())
    # every query is oracle-checked (no rows-only escapes)
    rows_only = q - set(o)
    assert rows_only == set(), rows_only


def test_entry_callable_defined():
    assert callable(entry_mod.entry)


def test_query_legs_contract():
    """query_legs() gates must exist in queries(); every leg is callable.
    bench.py times these into BENCH_FULL.json verification_legs."""
    legs = entry_mod.query_legs()
    q = set(entry_mod.queries())
    assert set(legs) <= q, set(legs) - q
    for gate, m in legs.items():
        assert m and all(callable(f) for f in m.values()), gate
