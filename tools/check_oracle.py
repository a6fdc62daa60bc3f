"""Local simulation of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir; compare row count, sorted column names, and values
(order-insensitive, column-name-sorted).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from tsflex_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def dtype_kind(s: pd.Series) -> str:
    """Coarse dtype KIND, mirroring how the driver's value-hash sees a
    column: an int64 and a float64 holding equal values hash differently,
    so the local gate must treat a kind mismatch as a failure (this is
    exactly how the r4/r5 ``text_stats`` HUGEINT->decimal/float vs bigint
    mismatch stayed invisible locally for two rounds)."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if s.dtype == object:
        import decimal

        nn = s.dropna()
        if len(nn) and isinstance(nn.iloc[0], decimal.Decimal):
            return "float"  # decimal-kind hashes like a non-integer
    return "str"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if len(sys.argv) > 2:
        only = set(sys.argv[2:])
        queries = {k: v for k, v in queries.items() if k in only}
    failures = 0
    for name, fn in queries.items():
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(got)} (no oracle — rows-only check)")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        g, x = normalize(got), normalize(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(x.columns)}")
            failures += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} != {len(x)}")
            failures += 1
            continue
        kind_bad = [
            (c, str(got[c].dtype), str(exp[c].dtype), dtype_kind(g[c]), dtype_kind(x[c]))
            for c in g.columns
            if dtype_kind(g[c]) != dtype_kind(x[c])
        ]
        if kind_bad:
            print(f"FAIL {name}: dtype-KIND mismatch (driver hash would differ):")
            for c, sd, dd, sk, dk in kind_bad:
                print(f"       {c}: spark={sd} ({sk}) vs oracle={dd} ({dk})")
            failures += 1
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], x[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                eq = np.isclose(
                    a.astype(float), b.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
                ).all()
            else:
                eq = (a.astype(str) == b.astype(str)).all()
            if not eq:
                bad.append(c)
        if bad:
            print(f"FAIL {name}: value mismatch in {bad}")
            for c in bad[:2]:
                mism = (g[c].astype(str) != x[c].astype(str))
                print(pd.DataFrame({"spark": g[c][mism].head(5), "duck": x[c][mism].head(5)}))
            failures += 1
        else:
            print(f"OK   {name}: rows={len(g)} cols={len(g.columns)}")
    return failures


if __name__ == "__main__":
    sys.exit(main())
