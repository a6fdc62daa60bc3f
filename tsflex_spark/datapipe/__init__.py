from tsflex_spark.datapipe import (
    bpe,
    curation,
    decontam,
    dedup,
    multimodal,
    pipeline,
    similarity,
    text,
)

__all__ = [
    "bpe",
    "curation",
    "decontam",
    "dedup",
    "multimodal",
    "pipeline",
    "similarity",
    "text",
]
