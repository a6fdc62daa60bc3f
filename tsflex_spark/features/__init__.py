from tsflex_spark.features.feature import FeatureDescriptor, MultipleFeatureDescriptors
from tsflex_spark.features.feature_collection import FeatureCollection
from tsflex_spark.features.function_wrapper import FuncWrapper

__all__ = [
    "FeatureDescriptor",
    "MultipleFeatureDescriptors",
    "FeatureCollection",
    "FuncWrapper",
]
