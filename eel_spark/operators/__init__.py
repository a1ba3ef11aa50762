from eel_spark.operators import (
    dedup,
    frequency,
    multimodal,
    packing,
    quality_model,
    rollups,
    sampling,
    scd2,
    semdedup,
    similarity,
)

__all__ = [
    "dedup",
    "frequency",
    "multimodal",
    "packing",
    "quality_model",
    "rollups",
    "sampling",
    "scd2",
    "semdedup",
    "similarity",
]
