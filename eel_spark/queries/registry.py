"""Shared query registry + the @query decorator.

Every gated query registers here: ``QUERIES[name]`` is a callable
``(spark, sf_dir) -> DataFrame``; ``ORACLE[name]`` (when present) is the
DuckDB-equivalent SQL the driver hash-compares against at sf=0.01.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

QUERIES: dict = {}
ORACLE: dict = {}

# tracked-persist plumbing (see eel_spark/caching.py): queries and the
# operators beneath them pin multiply-read intermediates; building any
# registry query first releases the previous build's pins, so N
# in-session runs hold O(1) executor storage.
from eel_spark.caching import pin, release_pins  # noqa: F401


def query(name: str, oracle: str | None = None):
    """Register a query function; unwraps DataStream returns to DataFrame."""

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str):
            from eel_spark.datastream import DataStream

            release_pins()
            out = fn(spark, sf_dir)
            return out.df if isinstance(out, DataStream) else out

        wrapped.__name__ = name
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return wrapped

    return deco
