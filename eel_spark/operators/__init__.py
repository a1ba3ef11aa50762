from eel_spark.operators import (
    dedup,
    multimodal,
    packing,
    rollups,
    sampling,
    similarity,
)

__all__ = [
    "dedup",
    "multimodal",
    "packing",
    "rollups",
    "sampling",
    "similarity",
]
