"""FeatureDescriptor / MultipleFeatureDescriptors — the declarative feature spec.

Parity: reference tsflex/features/feature.py (window/stride parsing, tuple
series names, multi-stride lists). A descriptor is pure metadata; the
FeatureCollection compiles the set of descriptors into one Spark plan.
"""

from __future__ import annotations

from itertools import product
from typing import Callable, List, Optional, Sequence, Tuple, Union

from tsflex_spark.features.function_wrapper import FuncWrapper
from tsflex_spark.utils.time_args import TimeArg, arg_to_str

FuncLike = Union[str, Callable, FuncWrapper]


def _to_tuple(series_name: Union[str, Sequence[str]]) -> Tuple[str, ...]:
    if isinstance(series_name, str):
        return (series_name,)
    return tuple(series_name)


def _validate_name(name: str) -> None:
    # '|' and '__' are reserved by the output-naming grammar
    # (reference feature_collection.py:55-67)
    assert "|" not in name, f"series name {name!r} must not contain '|'"
    assert "__" not in name, f"series name {name!r} must not contain '__'"


class FeatureDescriptor:
    """One (function, series-name(s), window, stride(s)) combination."""

    def __init__(
        self,
        function: FuncLike,
        series_name: Union[str, Sequence[str]],
        window: Optional[TimeArg] = None,
        stride: Optional[Union[TimeArg, List[TimeArg]]] = None,
    ):
        self.series_name: Tuple[str, ...] = _to_tuple(series_name)
        for name in self.series_name:
            _validate_name(name)
        self.window = window
        if stride is not None and not isinstance(stride, list):
            stride = [stride]
        self.stride: Optional[List[TimeArg]] = stride
        self.function: FuncWrapper = (
            function if isinstance(function, FuncWrapper) else FuncWrapper(function)
        )

    @property
    def window_str(self) -> str:
        return "manual" if self.window is None else arg_to_str(self.window)

    def get_nb_output_features(self) -> int:
        return len(self.function.output_names)

    def __repr__(self) -> str:
        return (
            f"FeatureDescriptor({self.function.func_name}, {self.series_name}, "
            f"w={self.window}, s={self.stride})"
        )


class MultipleFeatureDescriptors:
    """Cross product of functions × series_names × windows × strides.

    Parity: reference tsflex/features/feature.py (MultipleFeatureDescriptors).
    """

    def __init__(
        self,
        functions: Union[FuncLike, List[FuncLike]],
        series_names: Union[str, Sequence[str], List[Sequence[str]]],
        windows: Optional[Union[TimeArg, List[TimeArg]]] = None,
        strides: Optional[Union[TimeArg, List[TimeArg]]] = None,
    ):
        if not isinstance(functions, list):
            functions = [functions]
        # series_names: str | tuple | list of those — a bare str or tuple is
        # one entry (a tuple is a single multi-series descriptor)
        if not isinstance(series_names, list):
            series_names = [series_names]
        if windows is not None and not isinstance(windows, list):
            windows = [windows]
        self.feature_descriptions: List[FeatureDescriptor] = []
        for func, series, window in product(
            functions, series_names, windows if windows is not None else [None]
        ):
            self.feature_descriptions.append(
                FeatureDescriptor(func, series, window, strides)
            )
