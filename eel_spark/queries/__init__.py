"""Query registry: every implemented operator/query from SURVEY.md §2 gets
a ``QUERIES[name]`` callable ``(spark, sf_dir) -> DataFrame`` and (when
SQL-expressible) an ``ORACLE[name]`` DuckDB SQL string — the driver's
correctness gate runs both sides at sf=0.01.
"""

from __future__ import annotations

from eel_spark.queries import tpch

_MODULES = [tpch]

QUERIES: dict = {}
ORACLE: dict = {}
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLE.update(_m.ORACLE)
