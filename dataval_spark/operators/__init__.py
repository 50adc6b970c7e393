from dataval_spark.operators import (
    corpus,
    dedup,
    ivf,
    mixing,
    multimodal,
    packing,
    quality_filters,
    quantize,
    rollup,
    semdedup,
    similarity,
    text,
)

__all__ = [
    "corpus",
    "dedup",
    "ivf",
    "mixing",
    "multimodal",
    "packing",
    "quality_filters",
    "quantize",
    "rollup",
    "semdedup",
    "similarity",
    "text",
]
