from eel_spark.operators import (
    dedup,
    multimodal,
    packing,
    quality_model,
    rollups,
    sampling,
    semdedup,
    similarity,
)

__all__ = [
    "dedup",
    "multimodal",
    "packing",
    "quality_model",
    "rollups",
    "sampling",
    "semdedup",
    "similarity",
]
