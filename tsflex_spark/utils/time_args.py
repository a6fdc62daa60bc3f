"""Window / stride argument parsing and the output-naming time grammar.

Parity notes (behavior only, engine is independent):
- ``parse_time_arg`` accepts time-strings and ``pd.Timedelta``; a bare
  numeric string is rejected (reference: tsflex/utils/argument_parsing.py:88-117).
- ``timedelta_to_str`` produces the tight ``$D_$h$m$s.$ms`` grammar used in
  output column names, e.g. ``30s``, ``1D_2h`` (reference:
  tsflex/utils/argument_parsing.py:48-85). This grammar is API — ``reduce()``
  parses it back out of column names.
"""

from __future__ import annotations

from typing import Union

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

MICROS = 1_000_000  # microseconds per second — engine-wide TIME unit


def ts_micros(col: Union[str, Column]) -> Column:
    """Timestamp column → integer microseconds since epoch (the TIME index).

    Accepts both ``TIMESTAMP`` and ``TIMESTAMP_NTZ`` inputs: Spark 4 reads
    tz-naive parquet timestamps as NTZ by default
    (``spark.sql.parquet.inferTimestampNTZ.enabled=true``), and
    ``unix_micros`` rejects NTZ outright. The ``cast("timestamp")`` is an
    identity on TIMESTAMP and, with the session timezone pinned to UTC
    (session.py), instant-preserving on NTZ — one expression covers both.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))

TimeArg = Union[str, pd.Timedelta, int, float]


def parse_time_arg(arg: Union[str, pd.Timedelta]) -> pd.Timedelta:
    """Parse a window/stride time argument into a ``pd.Timedelta``."""
    if isinstance(arg, pd.Timedelta):
        return arg
    if isinstance(arg, str):
        if arg.isnumeric():
            raise ValueError(f"time-string arg {arg} must contain a unit")
        return pd.Timedelta(arg)
    raise TypeError(f"arg type {type(arg)} is not supported!")


def timedelta_to_str(td: pd.Timedelta) -> str:
    """Tight string representation of a timedelta for output column names."""
    out = ""
    if td < pd.Timedelta(seconds=0):
        td = -td
        out += "NEG"
    c = td.components
    if c.days > 0:
        out += f"{c.days}D"
    if c.hours > 0 or c.minutes > 0 or c.seconds > 0 or c.milliseconds > 0:
        out += "_" if out else ""
    if c.hours > 0:
        out += f"{c.hours}h"
    if c.minutes > 0:
        out += f"{c.minutes}m"
    if c.seconds > 0 or c.milliseconds > 0:
        out += f"{c.seconds}"
        if c.milliseconds:
            out += "." + str(c.milliseconds / 1000).split(".")[-1].rstrip("0")
        out += "s"
    return out


def arg_to_str(arg: TimeArg) -> str:
    """Window/stride → the string used inside output column names.

    TIME args go through the timedelta grammar; SEQUENCE args use their
    plain repr (``10`` → ``"10"``, ``2.5`` → ``"2.5"``).
    """
    if isinstance(arg, (int, float)) and not isinstance(arg, bool):
        return str(arg)
    return timedelta_to_str(parse_time_arg(arg))


def to_numeric_units(arg: TimeArg, is_time: bool) -> Union[int, float]:
    """Window/stride → the engine's numeric domain.

    TIME domain: integer **microseconds** (exact arithmetic against
    ``unix_micros(ts)``). SEQUENCE domain: the numeric value as given.
    """
    if is_time:
        td = parse_time_arg(arg)  # raises on numerics — same dispatch rule
        return int(td.value // 1000)  # pd.Timedelta.value is ns
    if isinstance(arg, bool) or not isinstance(arg, (int, float)):
        raise TypeError(f"sequence-domain window/stride must be numeric, got {type(arg)}")
    return arg
