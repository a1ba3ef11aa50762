"""eel_spark — a PySpark-native re-implementation of the capabilities of
eel-lib/eel (reference: /root/reference, the io.eels Scala toolkit).

The core abstraction is :class:`eel_spark.datastream.DataStream`, a thin,
fluent, *declarative* wrapper over a PySpark DataFrame that exposes the
reference's DataStream operator surface (see SURVEY.md §2.1) while letting
Catalyst/Tungsten pick physical strategies (pushdown, broadcast, AQE).

Beyond the reference surface, :mod:`eel_spark.operators` adds LLM-pipeline
operators (dedup families, ANN similarity, multimodal plumbing) and
:mod:`eel_spark.functions` adds text analysis — all JVM-side expressions
unless genuinely impossible.
"""

from eel_spark import predicate
from eel_spark.datastream import DataStream, from_values, from_rows
from eel_spark.session import get_session
from eel_spark.scale import (
    ensure_parallelism,
    salted_aggregate,
    salted_join,
    write_bucketed,
)
from eel_spark.sql import SqlContext

__all__ = [
    "predicate",
    "DataStream",
    "from_values",
    "from_rows",
    "get_session",
    "SqlContext",
    "salted_join",
    "salted_aggregate",
    "ensure_parallelism",
    "write_bucketed",
]

__version__ = "0.1.0"
