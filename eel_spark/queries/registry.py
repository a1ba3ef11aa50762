"""Shared query registry + the @query decorator.

Every gated query registers here: ``QUERIES[name]`` is a callable
``(spark, sf_dir) -> DataFrame``; ``ORACLE[name]`` (when present) is the
DuckDB-equivalent SQL the driver hash-compares against at sf=0.01.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

QUERIES: dict = {}
ORACLE: dict = {}

# Rotated OUT of the 50-slot driver gate (round 7) but still fully
# implemented and oracle-checked by pytest (tests/test_ungated.py runs
# each against its DuckDB oracle): the driver registry is capped at 50,
# and these slots moved to operator families that previously had zero
# CORRECTNESS coverage. Shape-wise each remains covered by a gated
# sibling (q4 for q12, q19 for q14/q6, q3/q18 for q10, q2/q11 for q17,
# ops_sessionize for the pivot query, sampling_hash_split for the
# hash-mod sample). Rotated-out headline queries stay benched: bench.py
# resolves names from QUERIES ∪ UNGATED_QUERIES.
UNGATED_QUERIES: dict = {}
UNGATED_ORACLE: dict = {}

# tracked-persist plumbing (see eel_spark/caching.py): queries and the
# operators beneath them pin multiply-read intermediates; building any
# registry query first releases the previous build's pins, so N
# in-session runs hold O(1) executor storage.
from eel_spark.caching import pin, release_pins  # noqa: F401


def query(name: str, oracle: str | None = None, gated: bool = True):
    """Register a query function; unwraps DataStream returns to DataFrame.

    ``gated=False`` keeps a rotated-out query implemented and
    pytest-oracled (UNGATED_QUERIES) without occupying one of the 50
    driver slots."""

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str):
            from eel_spark.datastream import DataStream

            release_pins()
            out = fn(spark, sf_dir)
            return out.df if isinstance(out, DataStream) else out

        wrapped.__name__ = name
        wrapped.__doc__ = fn.__doc__
        q, o = (QUERIES, ORACLE) if gated else (UNGATED_QUERIES, UNGATED_ORACLE)
        q[name] = wrapped
        if oracle is not None:
            o[name] = oracle
        return wrapped

    return deco
