"""Migration shim: convert real ``tsflex`` objects into ``tsflex_spark`` ones.

A user of the reference library (predict-idlab/tsflex) typically has a
module full of configured ``FeatureCollection`` / ``SeriesPipeline``
objects. ``from_tsflex`` converts those objects — *without importing
tsflex itself* (pure duck-typing on the reference's documented attribute
surface) — into the equivalent tsflex_spark declarations, so switching
engines is one call instead of a rewrite:

    fc_spark = from_tsflex(my_tsflex_feature_collection)
    out = fc_spark.calculate(spark_df, ts_col="ts")

Attribute surface relied on (reference file:line):
- ``FeatureCollection._feature_desc_dict`` — dict keyed by
  (series-name tuple, window) holding ``FeatureDescriptor`` lists
  (feature_collection.py:91-95).
- ``FeatureDescriptor.series_name / .window / .stride / .function``
  (feature.py:133-157; window is a parsed ``pd.Timedelta`` or a
  number, stride is ``None`` or a parsed list).
- ``MultipleFeatureDescriptors.feature_descriptions`` (feature.py:203).
- ``FuncWrapper.func / .output_names / .kwargs / .input_type /
  .vectorized`` (function_wrapper.py:99-118).
- ``SeriesProcessor.function / .series_names / .kwargs``
  (series_processor.py:129-132; ``series_names`` is a list of tuples).
- ``SeriesPipeline.processing_steps`` (series_pipeline.py:38).

Fidelity notes:
- Functions recognized by the native catalog (``np.mean``/``np.min``/…
  by identity, see features/catalog.py ``_CALLABLE_TABLE``) compile to
  Catalyst aggregates after conversion — a converted collection is not
  condemned to the UDF tier just because it came from tsflex.
- The reference infers output dtypes at run time; Spark needs them at
  plan time, so converted UDF-tier features default to DOUBLE. Pass
  ``output_dtypes={func_output_name: ddl}`` for non-numeric outputs.
- Converted ``SeriesProcessor`` steps run on the ``"pandas"`` tier
  (the reference hands functions ``pd.Series``); reference
  ``dataframe_func``-wrapped functions already accept ``*series`` and
  do their own frame merge, so they pass through unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

from tsflex_spark.features.feature import FeatureDescriptor, MultipleFeatureDescriptors
from tsflex_spark.features.feature_collection import FeatureCollection
from tsflex_spark.features.function_wrapper import FuncWrapper
from tsflex_spark.processing.series_pipeline import SeriesPipeline
from tsflex_spark.processing.series_processor import SeriesProcessor

_SPARK_TYPES = (
    FeatureCollection,
    FeatureDescriptor,
    MultipleFeatureDescriptors,
    FuncWrapper,
    SeriesPipeline,
    SeriesProcessor,
)

__all__ = ["from_tsflex"]


def _convert_funcwrapper(
    fw: Any, output_dtypes: Optional[Dict[str, Any]] = None
) -> FuncWrapper:
    """Reference FuncWrapper (or bare callable) -> Spark FuncWrapper."""
    if isinstance(fw, FuncWrapper):
        return fw
    if callable(fw) and not hasattr(fw, "output_names"):
        # a bare callable: the reference wraps lazily (feature.py:155-157);
        # its single output is named after the function, so the dtype map
        # keys on that name
        w = FuncWrapper(fw)
        dt = (output_dtypes or {}).get(w.output_names[0])
        if dt is None:
            return w
        return FuncWrapper(
            fw, output_names=list(w.output_names), output_dtypes=[dt]
        )
    names = list(fw.output_names)
    dts = [(output_dtypes or {}).get(n) for n in names]
    return FuncWrapper(
        fw.func,
        output_names=names,
        input_type=fw.input_type,
        vectorized=bool(getattr(fw, "vectorized", False)),
        output_dtypes=dts if any(d is not None for d in dts) else None,
        **dict(fw.kwargs),
    )


def _convert_fd(
    fd: Any, output_dtypes: Optional[Dict[str, Any]] = None
) -> FeatureDescriptor:
    stride = fd.stride
    if stride is not None:
        stride = list(stride)
    return FeatureDescriptor(
        _convert_funcwrapper(fd.function, output_dtypes),
        tuple(fd.series_name),
        fd.window,
        stride,
    )


def _convert_processor(sp: Any) -> SeriesProcessor:
    return SeriesProcessor(
        sp.function,
        [tuple(t) for t in sp.series_names],
        input_type="pandas",
        **dict(sp.kwargs),
    )


def from_tsflex(
    obj: Any, output_dtypes: Optional[Dict[str, Any]] = None
) -> Union[
    FeatureCollection,
    FeatureDescriptor,
    List[FeatureDescriptor],
    FuncWrapper,
    SeriesPipeline,
    SeriesProcessor,
]:
    """Convert a tsflex object to its tsflex_spark equivalent.

    Accepts ``FeatureCollection`` / ``FeatureDescriptor`` /
    ``MultipleFeatureDescriptors`` (returned as a list of descriptors) /
    ``FuncWrapper`` / bare callables / ``SeriesPipeline`` /
    ``SeriesProcessor``. tsflex_spark objects pass through unchanged.

    ``output_dtypes``: optional ``{output_name: spark_ddl}`` map applied
    to converted UDF-tier features whose outputs are not DOUBLE (the
    reference infers dtypes at run time; Spark plans need them up
    front — see FuncWrapper.output_dtypes).
    """
    if isinstance(obj, _SPARK_TYPES):
        return obj
    if isinstance(obj, (list, tuple)):
        # a user-held list of descriptors / MFDs / processors: convert
        # each element, flattening MultipleFeatureDescriptors expansions
        out: List[Any] = []
        for item in obj:
            conv = from_tsflex(item, output_dtypes)
            out.extend(conv) if isinstance(conv, list) else out.append(conv)
        return out
    # FeatureCollection: the dict holds every descriptor post-product
    if hasattr(obj, "_feature_desc_dict"):
        fds = [
            _convert_fd(fd, output_dtypes)
            for fd_list in obj._feature_desc_dict.values()
            for fd in fd_list
        ]
        return FeatureCollection(fds)
    if hasattr(obj, "feature_descriptions"):  # MultipleFeatureDescriptors
        return [_convert_fd(fd, output_dtypes) for fd in obj.feature_descriptions]
    if hasattr(obj, "series_name") and hasattr(obj, "function"):  # FeatureDescriptor
        return _convert_fd(obj, output_dtypes)
    if hasattr(obj, "processing_steps"):  # SeriesPipeline
        return SeriesPipeline([_convert_processor(p) for p in obj.processing_steps])
    if hasattr(obj, "series_names") and hasattr(obj, "function"):  # SeriesProcessor
        return _convert_processor(obj)
    if hasattr(obj, "output_names") and hasattr(obj, "func"):  # FuncWrapper
        return _convert_funcwrapper(obj, output_dtypes)
    if callable(obj):
        return _convert_funcwrapper(obj, output_dtypes)
    raise TypeError(
        f"cannot convert {type(obj).__module__}.{type(obj).__name__}; expected a "
        "tsflex FeatureCollection/FeatureDescriptor/MultipleFeatureDescriptors/"
        "FuncWrapper/SeriesPipeline/SeriesProcessor or a callable"
    )
