"""Hive-style table source/sink over the Spark catalog.

Reference: eel-hive — HiveSource (partition pruning, projection),
HiveSink (dynamic partitioning, alignment/evolution strategies),
HiveOps/HiveTable (DDL, partition listing, stats), Compactor.

Spark mapping: the catalog IS the metastore client. Partition pruning is
automatic when filtering on partition columns; dynamic partition writes
are ``partitionBy`` + ``insertInto``; compaction is a coalesced rewrite;
stats come from ``ANALYZE TABLE`` / catalog metadata. Works against the
in-session catalog locally and a real metastore on a cluster unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eel_spark.datastream import DataStream
from eel_spark.sources.files import Sink, Source


@dataclass
class HiveSource(Source):
    """HiveSource.scala: read with partition-constraint pushdown.

    ``partition_filter`` is a SQL predicate over partition columns — it
    prunes partitions at planning time (PartitionFilters in the scan),
    the Spark equivalent of HiveSource.withPartitionConstraint.
    """

    table: str
    partition_filter: str | None = None
    projection: list[str] | None = None

    def to_datastream(self, spark: SparkSession) -> DataStream:
        df = spark.table(self.table)
        if self.partition_filter:
            df = df.filter(self.partition_filter)
        if self.projection:
            df = df.select(*self.projection)
        return DataStream(df)


@dataclass
class HiveSink(Sink):
    """HiveSink.scala: dynamic-partition writes with schema alignment.

    align=True reorders/casts the incoming stream to the target table
    schema before writing (AlignmentStrategy.scala) — new columns error,
    matching the reference's strict default.
    """

    table: str
    mode: str = "append"
    partition_by: list[str] = dc_field(default_factory=list)
    format: str = "parquet"
    align: bool = True

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        spark = ds.df.sparkSession
        df: DataFrame = ds.df
        if parallelism:
            df = df.repartition(parallelism)
        exists = spark.catalog.tableExists(self.table)
        n = df.count()
        if exists and self.align:
            target = spark.table(self.table).schema
            df = DataStream(df).align(target).df
        writer = df.write.format(self.format).mode(self.mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.saveAsTable(self.table)
        return n


class HiveTable:
    """HiveTable/HiveOps: partition listing, stats, compaction, DDL."""

    def __init__(self, spark: SparkSession, table: str):
        self.spark = spark
        self.table = table

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def schema(self):
        return self.spark.table(self.table).schema

    def partitions(self) -> list[dict[str, str]]:
        """HiveOps.partitionValues → SHOW PARTITIONS parsed to dicts."""
        try:
            rows = self.spark.sql(f"SHOW PARTITIONS {self.table}").collect()
        except Exception:
            return []  # unpartitioned
        out = []
        for r in rows:
            spec = {}
            for kv in r[0].split("/"):
                k, _, v = kv.partition("=")
                spec[k] = v
            out.append(spec)
        return out

    def stats(self) -> dict[str, int]:
        """HiveStats.scala → ANALYZE TABLE + catalog stats."""
        self.spark.sql(f"ANALYZE TABLE {self.table} COMPUTE STATISTICS")
        desc = {
            r["col_name"]: r["data_type"]
            for r in self.spark.sql(f"DESCRIBE TABLE EXTENDED {self.table}").collect()
        }
        import re

        stats_line = desc.get("Statistics", "")
        m = re.search(r"(\d+) bytes(?:, (\d+) rows)?", stats_line)
        return {
            "bytes": int(m.group(1)) if m else -1,
            "rows": int(m.group(2)) if m and m.group(2) else self.spark.table(self.table).count(),
        }

    def compact(self, target_files: int = 1) -> None:
        """Compactor.scala: rewrite the table's data into ``target_files``
        files (per partition when partitioned) — the many-small-files fix
        the reference sells as a headline use case."""
        df = self.spark.table(self.table)
        part_cols = [
            c.name for c in self.spark.catalog.listColumns(self.table) if c.isPartition
        ]
        tmp = df
        if part_cols:
            tmp = df.repartition(target_files, *[F.col(c) for c in part_cols])
        else:
            tmp = df.coalesce(target_files)
        tmp.write.mode("overwrite").format("parquet").saveAsTable(f"{self.table}__compact")
        self.spark.sql(f"DROP TABLE {self.table}")
        self.spark.sql(f"ALTER TABLE {self.table}__compact RENAME TO {self.table}")

    def show_ddl(self) -> str:
        """HiveDDL.showDDL."""
        return self.spark.sql(f"SHOW CREATE TABLE {self.table}").first()[0]

    def fetch_spec(self) -> dict:
        """FetchSpec (eel-cli FetchSpecMain): a portable JSON description
        of the table — fields, partition columns, format — that
        apply_spec can recreate elsewhere."""
        cols = self.spark.catalog.listColumns(self.table)
        detail = {
            r["col_name"]: r["data_type"]
            for r in self.spark.sql(f"DESCRIBE TABLE EXTENDED {self.table}").collect()
        }
        return {
            "table": self.table,
            "fields": [
                {"name": c.name, "type": c.dataType, "nullable": c.nullable}
                for c in cols
                if not c.isPartition
            ],
            "partitioned_by": [
                {"name": c.name, "type": c.dataType} for c in cols if c.isPartition
            ],
            "format": detail.get("Provider", "parquet").lower(),
        }

    @staticmethod
    def apply_spec(spark: SparkSession, spec: dict) -> "HiveTable":
        """ApplySpec (eel-cli ApplySpecMain): create the table described
        by a fetch_spec dict (no-op if it already exists)."""
        if spark.catalog.tableExists(spec["table"]):
            return HiveTable(spark, spec["table"])
        cols = ", ".join(
            f"`{f['name']}` {f['type']}"
            for f in spec["fields"] + spec.get("partitioned_by", [])
        )
        ddl = f"CREATE TABLE {spec['table']} ({cols}) USING {spec.get('format', 'parquet')}"
        if spec.get("partitioned_by"):
            names = ", ".join(f"`{f['name']}`" for f in spec["partitioned_by"])
            ddl += f" PARTITIONED BY ({names})"
        spark.sql(ddl)
        return HiveTable(spark, spec["table"])
