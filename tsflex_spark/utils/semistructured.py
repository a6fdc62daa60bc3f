"""Semi-structured (JSON string) column support.

Event streams carry a typed core plus a JSON "properties" bag (the
``events.props`` shape). These helpers make the bag queryable without
pretending it has a fixed schema upstream:

- ``infer_json_schema``: schema from a BOUNDED sample (driver-side,
  sample-sized — never a full scan); fields present in any sampled
  record union together, conflicting primitive types widen to string
  (Spark's JSON reader semantics).
- ``parse_json_col``: ``from_json`` against a known/inferred schema —
  the fast path: one codegen projection, pushdown-friendly, NULL on
  malformed records (PERMISSIVE).
- ``flatten_struct``: promote (nested) struct fields to top-level
  columns with ``_``-joined names — the step before a feature frame or
  a parquet sink, where nested structs cost column pruning.

At 100 TB the pattern is: infer once on a sample, REGISTER the schema
(it is code, not data), parse with the literal schema everywhere —
per-batch re-inference is both slow and schema-unstable.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def infer_json_schema(
    df: DataFrame, col: str, sample: int = 1000, fraction: Optional[float] = None
) -> T.StructType:
    """Infer a struct schema from up to ``sample`` non-null JSON strings
    (driver-bounded; uses Spark's own JSON reader so the result matches
    what ``from_json`` will produce).

    The default ``limit`` pull reads the FIRST partitions — fields that
    only appear in later data (a property added mid-history on a
    time-ordered table) are missed. Pass ``fraction`` for a
    partition-spanning Bernoulli sample instead; the fraction is then
    the budget (no limit re-truncation)."""
    src = df.select(F.col(col).alias("j")).where(F.col("j").isNotNull())
    if fraction is not None:
        rows = src.sample(False, float(fraction), 7).collect()
    else:
        rows = src.limit(int(sample)).collect()
    strs = [r["j"] for r in rows]
    if not strs:
        return T.StructType([])
    spark = df.sparkSession
    inferred = spark.read.json(spark.sparkContext.parallelize(strs, 1))
    fields = [f for f in inferred.schema.fields if not f.name.startswith("_corrupt")]
    return T.StructType(fields)


def parse_json_col(
    df: DataFrame,
    col: str,
    schema: Optional[T.StructType] = None,
    out_col: Optional[str] = None,
    sample: int = 1000,
) -> DataFrame:
    """Parse a JSON string column into a struct column (``out_col``,
    default ``<col>_parsed``). Pass ``schema`` in production; omitting
    it infers from a sample (convenience / exploration)."""
    sch = schema if schema is not None else infer_json_schema(df, col, sample)
    return df.withColumn(out_col or f"{col}_parsed", F.from_json(F.col(col), sch))


def flatten_struct(
    df: DataFrame,
    col: str,
    prefix: Optional[str] = None,
    drop: bool = True,
    sep: str = "_",
) -> DataFrame:
    """Promote a struct column's fields (recursively) to top-level
    columns named ``<prefix><sep><path>``; arrays/maps stay intact at
    their level. ``drop=True`` removes the struct afterwards."""
    pfx = prefix if prefix is not None else col
    dtype = df.schema[col].dataType
    if not isinstance(dtype, T.StructType):
        raise ValueError(f"{col} is {dtype.simpleString()}, not a struct")

    def leaves(t: T.StructType, path):
        out = []
        for f in t.fields:
            p = path + [f.name]
            if isinstance(f.dataType, T.StructType):
                out += leaves(f.dataType, p)
            else:
                out.append(p)
        return out

    cols = [df[c] for c in df.columns if c != col or not drop]
    for path in leaves(dtype, []):
        cols.append(
            F.col(".".join([col] + path)).alias(sep.join([pfx] + path))
        )
    return df.select(*cols)


def json_field(df_col: str, path: str):
    """One-field extraction without a schema: ``get_json_object`` with a
    ``$.path`` expression — the right tool when a query needs a single
    key from a huge bag (no full parse, stays codegen)."""
    return F.get_json_object(F.col(df_col), f"$.{path}")
