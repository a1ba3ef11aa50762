"""SqlContext — run SQL over registered DataStreams.

Reference: eel-core/src/main/scala/io/eels/component/SqlContext.scala, which
round-trips every registered stream through an embedded H2 database. Spark
has a first-class SQL engine, so registration is a temp view and queries run
through Catalyst (same optimizer, same pushdown, no copy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from eel_spark.datastream import DataStream


class SqlContext:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._registered: list[str] = []

    def register_frame(self, name: str, ds: DataStream) -> None:
        """registerFrame (SqlContext.scala:24) — zero-copy temp view."""
        ds.df.createOrReplaceTempView(name)
        self._registered.append(name)

    def sql(self, query: str) -> DataStream:
        """sql (SqlContext.scala:28)."""
        return DataStream(self.spark.sql(query))

    def close(self) -> None:
        for name in self._registered:
            self.spark.catalog.dropTempView(name)
        self._registered.clear()
