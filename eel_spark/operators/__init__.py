from eel_spark.operators import (
    crawl,
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
    "crawl",
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
