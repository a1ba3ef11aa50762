from eel_spark.functions import hashes, robots, text, vectors

__all__ = ["hashes", "robots", "text", "vectors"]
