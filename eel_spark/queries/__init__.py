"""Query registry: every implemented operator/query from SURVEY.md §2 gets
a ``QUERIES[name]`` callable ``(spark, sf_dir) -> DataFrame`` and (when
SQL-expressible) an ``ORACLE[name]`` DuckDB SQL string — the driver's
correctness gate runs both sides at sf=0.01.
"""

from __future__ import annotations

# importing the modules registers their queries
from eel_spark.queries import ops, ops2, ops3, ops4, ops5, pipeline, tpch, tpch2  # noqa: F401
from eel_spark.queries.registry import (
    ORACLE,
    QUERIES,
    UNGATED_ORACLE,
    UNGATED_QUERIES,
)

__all__ = ["QUERIES", "ORACLE", "UNGATED_QUERIES", "UNGATED_ORACLE"]
