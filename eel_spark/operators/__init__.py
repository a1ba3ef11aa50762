from eel_spark.operators import dedup, multimodal, rollups, similarity

__all__ = ["dedup", "multimodal", "rollups", "similarity"]
