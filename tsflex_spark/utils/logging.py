"""Execution-time logging + log analytics (SURVEY §2.12 parity).

The reference logs one INFO line per feature function (function, series,
window, stride, output names, duration) to an optional file
(reference tsflex/features/logger.py:21-27, tsflex/utils/logging.py:44-121)
and ships parsers that turn the log into stats DataFrames
(tsflex/features/logger.py:30-195).

Here the engine logs per *query submission* (Spark fuses all functions of a
window config into one job, so per-function wall-times don't exist — the
logged unit is the compiled config) with the same analytics surface:
``get_feature_logs``, ``get_function_stats``, ``get_series_names_stats``.
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager
from typing import Iterator, Optional

import pandas as pd

logger = logging.getLogger("tsflex_spark")
logger.setLevel(logging.DEBUG)


def _setup_file_handler(logging_file_path: str) -> logging.Handler:
    fh = logging.FileHandler(logging_file_path, mode="a")
    fh.setFormatter(logging.Formatter("%(asctime)s | %(levelname)s | %(message)s"))
    fh.setLevel(logging.INFO)
    logger.addHandler(fh)
    return fh


@contextmanager
def log_execution(
    what: str,
    series: str,
    window: str,
    stride: str,
    output_names: str,
    logging_file_path: Optional[str] = None,
) -> Iterator[None]:
    """Context manager timing one compiled config / query submission.

    NB: Spark is lazy — what this brackets (and therefore what
    ``duration`` measures) is plan COMPILATION, not cluster execution;
    per-stage execution time lives in the Spark UI / event log. The
    reference executes eagerly so its per-function log durations are
    execution times; keeping the same log grammar lets the same analytics
    run on both, but compare absolute numbers only within one engine."""
    handler = _setup_file_handler(logging_file_path) if logging_file_path else None
    t0 = time.perf_counter()
    try:
        yield
    finally:
        duration = time.perf_counter() - t0
        logger.info(
            f"func={what} series={series} window={window} stride={stride} "
            f"outputs={output_names} duration={duration:.6f}"
        )
        if handler is not None:
            logger.removeHandler(handler)
            handler.close()


_LOG_RE = (
    r"func=(?P<function>\S+) series=(?P<series_names>\S+) window=(?P<window>\S+) "
    r"stride=(?P<stride>\S+) outputs=(?P<output_names>\S+) duration=(?P<duration>[\d.]+)"
)


def get_feature_logs(logging_file_path: str) -> pd.DataFrame:
    """Parse the log file into a DataFrame (one row per logged execution).

    Mirrors reference tsflex/features/logger.py:30-72.
    """
    # NOT read_csv(sep="|"): the message field itself contains '|' (fused
    # function lists, multi-series labels like ``va|vb``). The file format
    # is exactly ``asctime | LEVEL | message`` — split each line on the
    # first two ``" | "`` separators only.
    rows = []
    with open(logging_file_path) as fh:
        for line in fh:
            parts = line.rstrip("\n").split(" | ", 2)
            if len(parts) == 3:
                rows.append(parts)
    raw = pd.DataFrame(rows, columns=["log_time", "log_level", "message"])
    if raw.empty:
        return pd.DataFrame(
            columns=[
                "log_time", "function", "series_names", "window",
                "stride", "output_names", "duration",
            ]
        )
    raw["log_time"] = pd.to_datetime(raw["log_time"].str.strip(), format="mixed")
    ext = raw["message"].str.strip().str.extract(_LOG_RE)
    out = pd.concat([raw[["log_time"]], ext], axis=1).dropna(subset=["function"])
    out["duration"] = out["duration"].astype(float)
    return out.reset_index(drop=True)


def get_function_stats(logging_file_path: str) -> pd.DataFrame:
    """Duration stats per (function, window, stride) — reference :75-130."""
    df = get_feature_logs(logging_file_path)
    return (
        df.groupby(["function", "window", "stride"])["duration"]
        .agg(["sum", "mean", "std", "count"])
        .reset_index()
    )


def get_series_names_stats(logging_file_path: str) -> pd.DataFrame:
    """Duration stats per series-name set — reference :133-195."""
    df = get_feature_logs(logging_file_path)
    return (
        df.groupby("series_names")["duration"].agg(["sum", "mean", "std", "count"]).reset_index()
    )


def get_processor_logs(logging_file_path: str) -> pd.DataFrame:
    """Execution info per ``SeriesPipeline`` step — reference
    tsflex/processing/logger.py:70-106 (function, series names, duration,
    duration %). Same log grammar as the feature logs."""
    df = get_feature_logs(logging_file_path)
    df = df[["log_time", "function", "series_names", "output_names", "duration"]].copy()
    total = df["duration"].sum()
    df["duration %"] = (100 * df["duration"] / total).round(2) if total else 0.0
    return df
