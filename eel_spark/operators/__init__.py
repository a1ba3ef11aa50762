from eel_spark.operators import (
    dedup,
    multimodal,
    rollups,
    sampling,
    similarity,
)

__all__ = ["dedup", "multimodal", "rollups", "sampling", "similarity"]
