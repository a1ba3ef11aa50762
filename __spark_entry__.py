"""Driver contract for the spark-graft builder (PySpark target).

entry/queries/oracle_sql as specified by the driver: ``entry`` runs the
flagship query at sf0.001; ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from eel_spark.queries import ORACLE, QUERIES

_FLAGSHIP = "q1_pricing_summary"
_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES[_FLAGSHIP](spark, _SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return dict(ORACLE)
