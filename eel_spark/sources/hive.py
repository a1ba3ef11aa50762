"""Hive-style table source/sink over the Spark catalog.

Reference: eel-hive — HiveSource (partition pruning, projection),
HiveSink (dynamic partitioning, alignment/evolution strategies),
HiveOps/HiveTable (DDL, partition listing, stats), Compactor.

Spark mapping: the catalog IS the metastore client. Partition pruning is
automatic when filtering on partition columns; dynamic partition writes
are ``partitionBy`` + ``insertInto``; compaction is a staged salted
rewrite; stats come from ``ANALYZE TABLE`` / catalog metadata. Works
against the in-session catalog locally and a real metastore on a
cluster unchanged.

StagingStrategy.scala (write to a staging location, commit by move) is
subsumed by Spark's own file commit protocol: every write stages task
output under ``_temporary`` and publishes atomically on job commit, so
readers never observe partial files — there is nothing to re-implement.
Schema evolution (MetastoreSchemaHandler.scala) is ``evolution=True`` on
HiveSink below.
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

    ``partition_filter`` is a predicate over partition columns — either a
    SQL string or a ``Predicate`` tree (eel-core PredicateBuilder.scala:1
    applied at the hive source). Both compile to a Column before the
    scan, so Catalyst prunes partitions at planning time (PartitionFilters
    in the scan) — the Spark equivalent of
    HiveSource.withPartitionConstraint.
    """

    table: str
    partition_filter: object | None = None  # Predicate | str | None
    projection: list[str] | None = None

    def to_datastream(self, spark: SparkSession) -> DataStream:
        df = spark.table(self.table)
        if self.partition_filter is not None:
            pf = self.partition_filter
            df = df.filter(pf.to_column() if hasattr(pf, "to_column") else pf)
        if self.projection:
            df = df.select(*self.projection)
        return DataStream(df)


@dataclass
class HiveSink(Sink):
    """HiveSink.scala: dynamic-partition writes with schema alignment and
    evolution (AlignmentStrategy.scala, MetastoreSchemaHandler.scala:1,
    StagingStrategy.scala:1).

    - align=True (strict default): reorder/cast the incoming stream to the
      target table schema; NEW columns in the stream error.
    - evolution=True: new stream columns are first added to the table via
      ``ALTER TABLE ... ADD COLUMNS`` (nullable — old rows read as NULL),
      then the stream is aligned to the evolved schema. This is the
      add-new-column metastore evolution path; type CHANGES still error
      (narrowing silently would corrupt data).
    """

    table: str
    mode: str = "append"
    partition_by: list[str] = dc_field(default_factory=list)
    format: str = "parquet"
    align: bool = True
    evolution: bool = False

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        spark = ds.df.sparkSession
        df: DataFrame = ds.df
        if parallelism:
            df = df.repartition(parallelism)
        exists = spark.catalog.tableExists(self.table)
        if exists and self.evolution:
            target_names = {f.name.lower() for f in spark.table(self.table).schema.fields}
            new_fields = [
                f for f in df.schema.fields if f.name.lower() not in target_names
            ]
            if new_fields:
                cols = ", ".join(
                    f"`{f.name}` {f.dataType.simpleString()}" for f in new_fields
                )
                spark.sql(f"ALTER TABLE {self.table} ADD COLUMNS ({cols})")
        if exists and self.align:
            target = spark.table(self.table).schema
            # evolution pads columns absent from this batch as typed NULLs
            df = DataStream(df).align(target, pad_missing=self.evolution).df
        observed, obs = self._observed(df)
        writer = observed.write.format(self.format).mode(self.mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.saveAsTable(self.table)
        return int(obs.get["rows"])


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
        from pyspark.errors import AnalysisException

        try:
            rows = self.spark.sql(f"SHOW PARTITIONS {self.table}").collect()
        except AnalysisException as e:
            # ONLY "not partitioned" maps to [] — a missing table or
            # permission failure must surface, not read as unpartitioned
            if "NOT_A_PARTITIONED_TABLE" in str(e) or "not partitioned" in str(e):
                return []
            raise
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

    def provider(self) -> str:
        """The table's storage format (parquet/orc/...), from the catalog."""
        for r in self.spark.sql(f"DESCRIBE TABLE EXTENDED {self.table}").collect():
            if r["col_name"] == "Provider":
                return r["data_type"].lower()
        return "parquet"

    def compact(self, target_files: int = 1) -> None:
        """Compactor.scala: rewrite the table's data into ``target_files``
        files (at most ``target_files`` per partition when partitioned,
        scheme AND storage format preserved — a hardcoded parquet rewrite
        would silently convert ORC tables) — the many-small-files fix the
        reference sells as a headline use case."""
        fmt = self.provider()
        df = self.spark.table(self.table)
        part_cols = [
            c.name for c in self.spark.catalog.listColumns(self.table) if c.isPartition
        ]
        writer = None
        if part_cols:
            # Salt the repartition so each hive-partition lands in up to
            # ``target_files`` tasks → ≤ target_files files PER partition,
            # and keep the partition scheme on the rewritten table
            # (partitionBy) so pruning / SHOW PARTITIONS / dynamic-partition
            # writes keep working after compaction.
            salt = F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(target_files)
            )
            tmp = df.repartition(*[F.col(c) for c in part_cols], salt)
            writer = tmp.write.mode("overwrite").format(fmt).partitionBy(*part_cols)
        else:
            tmp = df.coalesce(target_files)
            writer = tmp.write.mode("overwrite").format(fmt)
        # Stage into a temp table, then overwrite the original FROM the
        # staged copy (never DROP+RENAME: a rename into a managed-table
        # location fails if any orphaned directory exists, and a crash
        # between DROP and RENAME would lose the table).
        tmp_name = f"{self.table}__compact"
        self.spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")
        writer.saveAsTable(tmp_name)
        staged = self.spark.table(tmp_name)
        if part_cols:
            # one staged file per (partition, salt) task → copy preserves counts
            out = staged.write.mode("overwrite").format(fmt).partitionBy(*part_cols)
        else:
            out = staged.coalesce(target_files).write.mode("overwrite").format(fmt)
        out.saveAsTable(self.table)
        self.spark.sql(f"DROP TABLE {tmp_name}")

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
