"""Strided-rolling segmentation on Spark DataFrames — the engine core.

Replicates the reference's segmentation rules bit-exactly
(strided_rolling.py:241-332; oracle tests tests/test_strided_rolling.py:139-210):

- segment count per stride ``nb = max((end - start - window) // stride + 1, 0)``,
  plus one trailing (possibly incomplete) window when ``include_final_window``
  and ``start + stride*nb <= end``;
- multi-stride start-index union (dedup + sort);
- half-open slicing ``[seg_start, seg_start + window)``;
- output index position ``window_idx`` ∈ {begin, middle, end}.

Scale design (SURVEY §4.2): instead of a naive non-equi range join
(O(n·m) BroadcastNestedLoop), segment membership is computed **on the data
side**: for a start-grid ``start0 + k*stride`` a row at ``t`` belongs to
segments ``k ∈ [floor((t-w-start0)/s)+1, floor((t-start0)/s)]`` — a bounded
``sequence``/``explode`` (fan-out ≤ ceil(window/stride)+1 per stride), then one
``groupBy(seg_start)``. Exactly one shuffle; no join against the data at all
(bounds are a one-row-per-key broadcast). Empty segments are restored by a
left join from the independently generated segment spine. Manual
(user-supplied) segments use a bucketed equi-join instead (granule = max
segment length), which AQE/Catalyst executes as a hash join, never a
nested-loop.

All index arithmetic is integer microseconds for TIME domain (exact), raw
numerics for SEQUENCE.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tsflex_spark.utils.data import DataType
from tsflex_spark.utils.time_args import ts_micros

TSN = "__tsn"  # numeric index column
SEG = "__seg_start"
SEG_END = "__seg_end"
SEG_ID = "__seg_id"
OUT_IDX = "__out_idx"
START = "__start"
END = "__end"

_BLOCK = 1 << 16  # max elements per generated array (bounds row explosion)

Num = Union[int, float]


def numeric_index(df: DataFrame, ts_col: str, domain: DataType) -> DataFrame:
    """Add the engine's numeric index column (``unix_micros`` for TIME)."""
    if domain == DataType.TIME:
        return df.withColumn(TSN, ts_micros(ts_col))
    return df.withColumn(TSN, F.col(ts_col))


def output_index(col: Column, domain: DataType, is_float: bool = False) -> Column:
    """Numeric index → user-facing index value."""
    if domain == DataType.TIME:
        return F.timestamp_micros(col.cast("long"))
    return col


def make_bounds(
    data: DataFrame,
    series_cols: Sequence[str],
    key_cols: Sequence[str],
    bound_method: str = "inner",
) -> DataFrame:
    """Per-key ``(START, END)`` bounds over the required series.

    inner = max(firsts)..min(lasts); inner-outer = max..max; outer = min..max
    (reference tsflex/features/utils.py:59-99). One tiny aggregate — O(#keys)
    rows regardless of data size.
    """
    mins = [F.min(F.when(F.col(s).isNotNull(), F.col(TSN))).alias(f"__mn_{i}") for i, s in enumerate(series_cols)]
    maxs = [F.max(F.when(F.col(s).isNotNull(), F.col(TSN))).alias(f"__mx_{i}") for i, s in enumerate(series_cols)]
    agg = data.groupBy(*key_cols).agg(*mins, *maxs) if key_cols else data.agg(*mins, *maxs)
    mn_cols = [F.col(f"__mn_{i}") for i in range(len(series_cols))]
    mx_cols = [F.col(f"__mx_{i}") for i in range(len(series_cols))]

    def _g(cols: List[Column]) -> Column:
        return cols[0] if len(cols) == 1 else F.greatest(*cols)

    def _l(cols: List[Column]) -> Column:
        return cols[0] if len(cols) == 1 else F.least(*cols)

    if bound_method == "inner":
        start, end = _g(mn_cols), _l(mx_cols)
    elif bound_method == "inner-outer":
        start, end = _g(mn_cols), _g(mx_cols)
    elif bound_method == "outer":
        start, end = _l(mn_cols), _g(mx_cols)
    else:
        raise ValueError(f"invalid bound_method {bound_method!r}")
    out = agg.select(*key_cols, start.alias(START), end.alias(END))
    return out.where(F.col(START).isNotNull() & F.col(END).isNotNull())


def _nb_expr(window: Num, stride: Num, include_final: bool) -> Column:
    """Segment count for one stride (reference strided_rolling.py:241-250)."""
    nb0 = F.greatest(
        F.floor((F.col(END) - F.col(START) - F.lit(window)) / F.lit(stride)) + F.lit(1),
        F.lit(0).cast("long"),
    )
    if not include_final:
        return nb0
    extra = F.when(F.col(START) + nb0 * F.lit(stride) <= F.col(END), F.lit(1)).otherwise(F.lit(0))
    return nb0 + extra.cast("long")


def _explode_counter(df: DataFrame, nb_col: str, out_col: str) -> DataFrame:
    """Explode ``k = 0..nb-1`` without materializing one giant array per row."""
    df = df.where(F.col(nb_col) > 0)
    n_blocks = F.floor((F.col(nb_col) - 1) / F.lit(_BLOCK))
    df = df.withColumn("__blk", F.explode(F.sequence(F.lit(0).cast("long"), n_blocks)))
    lo = F.col("__blk") * F.lit(_BLOCK)
    hi = F.least(F.col(nb_col) - 1, (F.col("__blk") + 1) * F.lit(_BLOCK) - 1)
    return df.withColumn(out_col, F.explode(F.sequence(lo, hi))).drop("__blk")


def make_segment_spine(
    bounds: DataFrame,
    window: Num,
    strides: Sequence[Num],
    include_final_window: bool,
    key_cols: Sequence[str],
) -> DataFrame:
    """Generate the segments DataFrame ``(keys..., SEG, SEG_END)``.

    Fully distributed (explodes the per-key bounds rows); multi-stride
    start-index union with dedup (reference strided_rolling.py:264-274).
    """
    spines = []
    for i, s in enumerate(strides):
        sp = bounds.withColumn("__nb", _nb_expr(window, s, include_final_window))
        sp = _explode_counter(sp, "__nb", "__k")
        sp = sp.select(*key_cols, (F.col(START) + F.col("__k") * F.lit(s)).alias(SEG))
        spines.append(sp)
    spine = spines[0]
    for sp in spines[1:]:
        spine = spine.unionByName(sp)
    if len(spines) > 1:
        spine = spine.dropDuplicates(list(key_cols) + [SEG])
    return spine.withColumn(SEG_END, F.col(SEG) + F.lit(window))


def assign_segments(
    data: DataFrame,
    bounds: DataFrame,
    window: Num,
    strides: Sequence[Num],
    include_final_window: bool,
    key_cols: Sequence[str],
) -> DataFrame:
    """Tag every data row with each segment start it falls into.

    Data-side membership computation — the scale-critical path (module
    docstring). Returns ``data`` columns + ``SEG``; rows in no segment are
    dropped, rows in many segments are duplicated (fan-out ≤
    ceil(window/stride)+1 per stride).
    """
    if key_cols:
        joined = data.join(F.broadcast(bounds), on=list(key_cols), how="inner")
    else:
        joined = data.crossJoin(F.broadcast(bounds))
    # reference slices data to [start, end] inclusive before segmenting
    # (feature_collection.py:1230-1238; pandas .loc[start:end])
    joined = joined.where((F.col(TSN) >= F.col(START)) & (F.col(TSN) <= F.col(END)))

    cand_arrays = []
    for i, s in enumerate(strides):
        nb = _nb_expr(window, s, include_final_window)
        k_hi = F.least(F.floor((F.col(TSN) - F.col(START)) / F.lit(s)), nb - 1)
        k_lo = F.greatest(
            F.floor((F.col(TSN) - F.lit(window) - F.col(START)) / F.lit(s)) + 1,
            F.lit(0).cast("long"),
        )
        # never build a descending sequence; emit a same-typed empty array instead
        full = F.transform(
            F.sequence(k_lo, F.greatest(k_lo, k_hi)), lambda k: F.col(START) + k * F.lit(s)
        )
        arr = F.when(k_hi >= k_lo, full).otherwise(F.slice(full, 1, 0))
        cand_arrays.append(arr)
    cands = cand_arrays[0] if len(cand_arrays) == 1 else F.array_distinct(F.concat(*cand_arrays))
    out = joined.withColumn(SEG, F.explode(cands))
    return out.drop(START, END)


def manual_segment_spine(
    spark: SparkSession,
    seg_starts: np.ndarray,
    seg_ends: np.ndarray,
    key_rows: Optional[DataFrame] = None,
) -> DataFrame:
    """User-supplied segment arrays → spine ``(SEG_ID, SEG, SEG_END)``.

    Variable-length segments allowed (reference strided_rolling.py:198-214).
    When ``key_rows`` (distinct keys DataFrame) is given, the same segments
    are replicated per key (cross join — spine is small, keys broadcast).
    """
    pdf = pd.DataFrame(
        {
            SEG_ID: np.arange(len(seg_starts), dtype=np.int64),
            SEG: np.asarray(seg_starts),
            SEG_END: np.asarray(seg_ends),
        }
    )
    spine = spark.createDataFrame(pdf)
    if key_rows is not None:
        spine = key_rows.crossJoin(F.broadcast(spine))
    return spine


def assign_manual_segments(
    data: DataFrame,
    spine: DataFrame,
    max_seg_len: Num,
    key_cols: Sequence[str],
) -> DataFrame:
    """Bucketed equi-join segment assignment for arbitrary segments.

    Granule = max segment length ⇒ every segment spans ≤ 2 buckets; the join
    is an equi-join on (keys, bucket) — hash-joinable, AQE-skew-splittable —
    with the exact half-open range predicate as a post-filter
    (SURVEY §4.2 "bucketize" strategy).
    """
    g = max(float(max_seg_len), 1.0)
    seg_b = spine.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(SEG) / F.lit(g)),
                F.greatest(F.floor(F.col(SEG) / F.lit(g)), F.floor((F.col(SEG_END) - F.lit(1e-9)) / F.lit(g))),
            )
        ),
    )
    data_b = data.withColumn("__bkt", F.floor(F.col(TSN) / F.lit(g)))
    cond = (F.col(TSN) >= F.col(SEG)) & (F.col(TSN) < F.col(SEG_END))
    joined = data_b.join(F.broadcast(seg_b), on=list(key_cols) + ["__bkt"], how="inner").where(cond)
    return joined.drop("__bkt")


def out_idx_expr(window_idx: str, domain: DataType) -> Column:
    """Output index per ``window_idx`` (reference strided_rolling.py:276-293)."""
    if window_idx == "end":
        col = F.col(SEG_END)
    elif window_idx == "begin":
        col = F.col(SEG)
    elif window_idx == "middle":
        half = (F.col(SEG_END) - F.col(SEG)) / F.lit(2)
        if domain == DataType.TIME:
            half = F.floor(half)
        col = F.col(SEG) + half
    else:
        raise ValueError(f"window_idx {window_idx!r} must be one of begin/middle/end")
    return col
