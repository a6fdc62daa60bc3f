"""(Advanced) utilities for the processing pipelines.

Spark-first re-expression of reference tsflex/processing/utils.py:16-81
(``process_chunks_multithreaded``): the reference maps a SeriesPipeline
over a list of pre-chunked pandas frames with a thread pool; here the
chunks live in ONE DataFrame and the pipeline runs over every chunk in a
single Spark job — the chunk id simply joins the pipeline's grouping keys,
so per-chunk isolation comes from Spark's partitioning instead of a
driver-side pool, and a million chunks cost the same scheduling as ten.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsflex_spark.processing.series_pipeline import SeriesPipeline


def process_chunks_multithreaded(
    data: DataFrame,
    chunks: DataFrame,
    series_pipeline: SeriesPipeline,
    *,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    chunk_col: str = "chunk_id",
    **processing_kwargs,
) -> DataFrame:
    """Process every chunk of ``data`` through ``series_pipeline``.

    ``chunks`` is the output of :func:`tsflex_spark.chunking.chunk_data`
    (``keys..., chunk_id, chunk_start, chunk_end, ...``). Rows are tagged
    with their chunk id via an interval join against the (small) chunk
    table — broadcast, so the 100 TB fact side never shuffles for the
    tagging — and the pipeline then runs with ``chunk_col`` appended to
    ``key_cols``: order-dependent (pandas-tier) steps operate per chunk,
    exactly like the reference's per-chunk pool workers, but as one
    distributed job. Rows outside every chunk (gap-filtered or
    min-duration-dropped spans) are excluded, mirroring the reference
    feeding only the chunk list.

    Returns one DataFrame carrying ``chunk_col``; re-joining chunk outputs
    is the caller's concern (reference note: "not concerned with joining
    the chunks").
    """
    key_cols = list(key_cols)
    sel = [*key_cols, F.col(chunk_col), "chunk_start", "chunk_end"]
    ch = chunks.select(*sel)
    cond = (F.col(ts_col) >= F.col("chunk_start")) & (F.col(ts_col) <= F.col("chunk_end"))
    for k in key_cols:
        cond = cond & (data[k] == ch[k])
    tagged = data.join(F.broadcast(ch), on=cond, how="inner").select(
        *[data[c] for c in data.columns], ch[chunk_col]
    )
    return series_pipeline.process(
        tagged,
        ts_col=ts_col,
        key_cols=[*key_cols, chunk_col],
        **processing_kwargs,
    )
