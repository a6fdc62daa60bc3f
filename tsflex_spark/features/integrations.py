"""Third-party feature-library wrappers (SURVEY §2.10 parity).

Mirrors the reference's integration surface
(reference tsflex/features/integrations.py:15-337): adapters that turn
seglearn / tsfresh / tsfel / catch22 feature functions into
``FuncWrapper``s the UDF tier can run. None of those libraries is
installed in this container — every wrapper is import-free at module load
and only touches the library object the CALLER passes in, exactly like the
reference (which takes the already-imported function/config as argument).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Union

import numpy as np
import pandas as pd

from tsflex_spark.features.function_wrapper import FuncWrapper


def seglearn_wrapper(func: Callable, func_name: Optional[str] = None) -> FuncWrapper:
    """Wrap a seglearn feature function (axis-0-vectorized over a (1, n)
    batch — reference integrations.py:15-48)."""

    def wrapped(x: np.ndarray) -> Any:
        out = func(x.reshape(1, len(x)))
        return out.flatten()[0] if hasattr(out, "flatten") else out

    wrapped.__name__ = "[seglearn_wrapped]__" + _name_of(func, func_name)
    output_names = _name_of(func, func_name)
    # hist-style funcs emit multiple bins
    if hasattr(func, "bins"):
        output_names = [f"{_name_of(func, func_name)}_bin{i}" for i in range(func.bins)]
    return FuncWrapper(wrapped, output_names=output_names)


def seglearn_feature_dict_wrapper(features_dict: Dict[str, Callable]) -> List[FuncWrapper]:
    """seglearn ``base_features()``-style dict → FuncWrappers (reference :51-98)."""
    return [seglearn_wrapper(f, name) for name, f in features_dict.items()]


def tsfel_feature_dict_wrapper(features_dict: Dict) -> List[FuncWrapper]:
    """tsfel ``get_features_by_domain()``-style config → FuncWrappers
    (reference :102-171). Unpacks {domain: {name: {function, parameters,
    n_features}}} entries."""
    import importlib

    wrappers: List[FuncWrapper] = []
    for domain_feats in features_dict.values():
        for name, spec in domain_feats.items():
            module_name, func_name = spec["function"].rsplit(".", 1)
            func = getattr(importlib.import_module(module_name), func_name)
            params = spec.get("parameters") or {}
            params = {k: v for k, v in params.items() if v not in (None, "")}
            n_out = spec.get("n_features", 1)
            out_names = name if n_out in (1, None) else [f"{name}_{i}" for i in range(int(n_out))]
            wrappers.append(FuncWrapper(func, output_names=out_names, **params))
    return wrappers


def tsfresh_simple_feature_wrapper(func: Callable, **kwargs: Any) -> FuncWrapper:
    """tsfresh 'simple' feature function → FuncWrapper (reference :175-207)."""
    return FuncWrapper(func, output_names=_name_of(func, None), **kwargs)


def tsfresh_combiner_feature_wrapper(func: Callable, param: List[Dict], **kwargs: Any) -> FuncWrapper:
    """tsfresh 'combiner' function (returns [(key, value), ...]) →
    multi-output FuncWrapper (reference :209-278). ``index_type`` funcs
    receive a pd.Series (time-aware) instead of ndarray."""

    def wrapped(x: Union[np.ndarray, pd.Series]) -> Any:
        out = func(x, param=param)
        return tuple(v for _k, v in out)

    wrapped.__name__ = "[tsfresh_combiner]__" + _name_of(func, None)
    out_names = [f"{_name_of(func, None)}_{_param_str(p)}" for p in param]
    input_type = pd.Series if getattr(func, "index_type", None) is not None else np.ndarray
    return FuncWrapper(wrapped, output_names=out_names, input_type=input_type)


def catch22_wrapper(catch22_all: Callable, catch24: bool = False) -> FuncWrapper:
    """pycatch22 ``catch22_all`` → 22/24-output FuncWrapper (reference :282-337)."""
    try:
        names = list(catch22_all(np.ones(3), catch24=catch24)["names"])
    except Exception:
        n = 24 if catch24 else 22
        names = [f"catch22_{i}" for i in range(n)]

    def wrapped(x: np.ndarray) -> Any:
        return tuple(catch22_all(x, catch24=catch24)["values"])

    wrapped.__name__ = "[catch22_wrapped]"
    return FuncWrapper(wrapped, output_names=names)


def _name_of(func: Callable, explicit: Optional[str]) -> str:
    if explicit:
        return explicit
    return getattr(func, "__name__", str(func))


def _param_str(p: Dict) -> str:
    return "_".join(f"{k}-{v}" for k, v in sorted(p.items()))
