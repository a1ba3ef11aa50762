"""GroupedDataStream — distributed aggregation.

Reference: eel-core/src/main/scala/io/eels/datastream/GroupedDataStream.scala.
The reference accumulates per-key mutable maps on a single thread and coerces
every value through ``toString.toDouble`` (GroupedDataStream.scala:97-147).
Here each aggregation is a Catalyst aggregate expression → hash aggregation
with partial (map-side) combine, exact decimal sums available, and no driver
state.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from eel_spark.datastream import DataStream


def _c(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


class GroupedDataStream:
    """Accumulates aggregations, realized on ``to_datastream()``.

    Mirrors GroupedDataStream.scala: ``aggregated()`` is the empty-key case
    (FullDatasetKeyFn), ``group_by(cols)`` the keyed case. Convenience
    sum/count/avg/min/max match the reference's surface; ``agg`` accepts any
    Spark aggregate Column for the rest.
    """

    def __init__(self, df: DataFrame, keys: list[Column], aggs: list[Column] | None = None):
        self._df = df
        self._keys = keys
        self._aggs = list(aggs or [])

    def _with(self, agg: Column) -> "GroupedDataStream":
        return GroupedDataStream(self._df, self._keys, self._aggs + [agg])

    # reference surface (GroupedDataStream.scala:78-83)
    def sum(self, field: str, alias: str | None = None) -> "GroupedDataStream":
        return self._with(F.sum(_c(field)).alias(alias or f"sum_{field}"))

    def count(self, alias: str = "count") -> "GroupedDataStream":
        return self._with(F.count(F.lit(1)).alias(alias))

    def avg(self, field: str, alias: str | None = None) -> "GroupedDataStream":
        return self._with(F.avg(_c(field)).alias(alias or f"avg_{field}"))

    def min(self, field: str, alias: str | None = None) -> "GroupedDataStream":
        return self._with(F.min(_c(field)).alias(alias or f"min_{field}"))

    def max(self, field: str, alias: str | None = None) -> "GroupedDataStream":
        return self._with(F.max(_c(field)).alias(alias or f"max_{field}"))

    def agg(self, *aggs: Column) -> "GroupedDataStream":
        out = self
        for a in aggs:
            out = out._with(a)
        return out

    def to_datastream(self) -> "DataStream":
        from eel_spark.datastream import DataStream

        if not self._aggs:
            raise ValueError("No aggregations specified")
        if self._keys:
            return DataStream(self._df.groupBy(*self._keys).agg(*self._aggs))
        return DataStream(self._df.agg(*self._aggs))

    # actions (GroupedDataStream.scala:72-74)
    def collect(self):
        return self.to_datastream().collect()

    def size(self) -> int:
        return self.to_datastream().count()
