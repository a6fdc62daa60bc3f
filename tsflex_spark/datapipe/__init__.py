from tsflex_spark.datapipe import (
    bpe,
    classifier,
    curation,
    decontam,
    dedup,
    dsir,
    embedding,
    lm,
    multimodal,
    pipeline,
    similarity,
    text,
)

__all__ = [
    "bpe",
    "classifier",
    "curation",
    "decontam",
    "dedup",
    "dsir",
    "embedding",
    "lm",
    "multimodal",
    "pipeline",
    "similarity",
    "text",
]
