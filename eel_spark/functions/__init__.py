from eel_spark.functions import hashes, text, vectors

__all__ = ["hashes", "text", "vectors"]
