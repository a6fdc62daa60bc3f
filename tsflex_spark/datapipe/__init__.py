from tsflex_spark.datapipe import (
    curation,
    decontam,
    dedup,
    multimodal,
    pipeline,
    similarity,
    text,
)

__all__ = [
    "curation",
    "decontam",
    "dedup",
    "multimodal",
    "pipeline",
    "similarity",
    "text",
]
