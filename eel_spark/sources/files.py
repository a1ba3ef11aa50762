"""File sources/sinks — the reference's component/{parquet,csv,json,orc,
avro,sequence} re-expressed as Spark readers/writers.

Key behaviors carried over:
- ParquetSource predicate + projection pushdown (ParquetPredicateBuilder.
  scala, ParquetSource.scala:withPredicate/withProjection) → here they are
  *free*: filters/selects on the returned DataStream reach the scan via
  Catalyst (verified in tests/test_plans.py).
- RollingParquetWriter.scala (roll by record count) → ``max_records_per_file``.
- CsvSource options (CsvSource.scala: delimiter/header/nulls/schema-infer)
  → reader options passthrough.
- FilePattern.scala (glob expansion) → Spark path globs + pathGlobFilter.
- Statistics (parquet footer counts, Statistics.scala) → pyarrow metadata.

Every sink's ``write`` returns the row count, mirroring ``to(sink)``
(DataStream.scala:1011) — counted via a Spark Observation (no second scan).
"""

from __future__ import annotations

import glob as _glob
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eel_spark.datastream import DataStream


class Source:
    """A Source produces a DataStream (Source.scala:toDataStream)."""

    def to_datastream(self, spark: SparkSession) -> DataStream:
        raise NotImplementedError

    def schema(self, spark: SparkSession) -> T.StructType:
        return self.to_datastream(spark).schema


class Sink:
    """A Sink consumes a DataStream, returning rows written."""

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        raise NotImplementedError

    @staticmethod
    def _observed(df: DataFrame) -> tuple[DataFrame, "Observation"]:
        """Attach a row-count Observation so the count comes from the SAME
        job as the write — never ``df.count()`` then write, which executes
        the upstream plan twice (and can disagree for non-deterministic
        plans). Read the count with ``int(obs.get["rows"])`` AFTER the
        write action."""
        obs = Observation()
        return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs

    def _write_df(
        self, df: DataFrame, fmt: str, path: str | None,
        mode: str, options: dict[str, Any], partition_by: list[str] | None = None,
        parallelism: int | None = None,
    ) -> int:
        observed, obs = self._observed(df)
        if parallelism:
            observed = observed.repartition(parallelism)
        writer = observed.write.format(fmt).mode(mode).options(**options)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if path is None:
            writer.save()
        else:
            writer.save(path)
        return obs.get["rows"]


# ---------------------------------------------------------------------------
# Parquet
# ---------------------------------------------------------------------------

@dataclass
class ParquetSource(Source):
    """ParquetSource.scala — with free predicate/projection pushdown.

    ``predicate`` takes an eel_spark.predicate tree (withPredicate,
    ParquetSource.scala:39): it compiles to ONE Column filter before the
    scan and Catalyst pushes it into the parquet reader (PushedFilters —
    plan-asserted in tests), instead of the reference's per-format
    row-group filter compiler."""

    path: str | list[str]
    merge_schema: bool = False
    options: dict[str, Any] = dc_field(default_factory=dict)
    predicate: Any = None  # eel_spark.predicate.Predicate
    projection: list[str] | None = None

    def with_predicate(self, predicate) -> "ParquetSource":
        from dataclasses import replace

        return replace(self, predicate=predicate)

    def with_projection(self, *fields: str) -> "ParquetSource":
        from dataclasses import replace

        return replace(self, projection=list(fields))

    def to_datastream(self, spark: SparkSession) -> DataStream:
        reader = spark.read.options(**self.options)
        if self.merge_schema:
            reader = reader.option("mergeSchema", "true")
        paths = self.path if isinstance(self.path, list) else [self.path]
        df = reader.parquet(*paths)
        if self.predicate is not None:
            df = df.filter(self.predicate.to_column())
        if self.projection:
            df = df.select(*self.projection)
        return DataStream(df)

    def statistics(self) -> dict[str, int]:
        """Statistics.scala: footer-level counts without a Spark job.
        Accepts a file, a glob, or a dataset DIRECTORY (the layout
        ParquetSink itself produces — part files are discovered
        recursively, `_`-prefixed metadata files skipped)."""
        import os

        import pyarrow.parquet as pq

        paths = self.path if isinstance(self.path, list) else [self.path]
        files: list[str] = []
        for p in paths:
            for hit in sorted(_glob.glob(p)) or [p]:
                if os.path.isdir(hit):
                    files.extend(
                        sorted(
                            f
                            for f in _glob.glob(
                                os.path.join(hit, "**", "*"), recursive=True
                            )
                            if os.path.isfile(f)
                            and not os.path.basename(f).startswith(("_", "."))
                        )
                    )
                else:
                    files.append(hit)
        rows = row_groups = 0
        total_bytes = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            rows += md.num_rows
            row_groups += md.num_row_groups
            total_bytes += md.serialized_size
        return {
            "rows": rows,
            "row_groups": row_groups,
            "files": len(files),
            "footer_bytes": total_bytes,
        }


@dataclass
class ParquetSink(Sink):
    """ParquetSink.scala + RollingParquetWriter.scala (max_records_per_file)."""

    path: str
    mode: str = "overwrite"
    compression: str = "snappy"
    max_records_per_file: int | None = None
    partition_by: list[str] | None = None

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        opts: dict[str, Any] = {"compression": self.compression}
        if self.max_records_per_file:
            opts["maxRecordsPerFile"] = str(self.max_records_per_file)
        return self._write_df(
            ds.df, "parquet", self.path, self.mode, opts, self.partition_by, parallelism
        )


# ---------------------------------------------------------------------------
# CSV
# ---------------------------------------------------------------------------

@dataclass
class CsvSource(Source):
    """CsvSource.scala: header/delimiter/quote/null handling + inference.

    Three schema paths, in precedence order: explicit ``schema``; a
    rule-based ``inferrer`` (SchemaInferrer.scala:6 — types from header
    NAMES, metadata-only, no data scan); Spark's sampling ``inferSchema``
    (costs an extra read pass — avoid at scale).
    """

    path: str
    header: bool = True
    delimiter: str = ","
    quote: str = '"'
    null_value: str = ""
    infer_schema: bool = True
    schema: T.StructType | None = None
    inferrer: Any = None  # eel_spark.schema.SchemaInferrer
    options: dict[str, Any] = dc_field(default_factory=dict)

    def to_datastream(self, spark: SparkSession) -> DataStream:
        reader = (
            spark.read.option("header", self.header)
            .option("sep", self.delimiter)
            .option("quote", self.quote)
            .option("nullValue", self.null_value)
            .options(**self.options)
        )
        if self.schema is not None:
            reader = reader.schema(self.schema)
        elif self.inferrer is not None:
            # header-only read (no inferSchema): Spark parses just the first
            # line of one file for column names — effectively metadata-only
            headers = reader.csv(self.path).columns
            reader = reader.schema(self.inferrer.infer(headers))
        elif self.infer_schema:
            reader = reader.option("inferSchema", "true")
        return DataStream(reader.csv(self.path))


@dataclass
class CsvSink(Sink):
    path: str
    mode: str = "overwrite"
    header: bool = True
    delimiter: str = ","

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        return self._write_df(
            ds.df, "csv", self.path, self.mode,
            {"header": self.header, "sep": self.delimiter}, None, parallelism,
        )


# ---------------------------------------------------------------------------
# JSON
# ---------------------------------------------------------------------------

@dataclass
class JsonSource(Source):
    """JsonSource.scala (JSON-lines; multiline for document arrays)."""

    path: str
    multiline: bool = False
    schema: T.StructType | None = None

    def to_datastream(self, spark: SparkSession) -> DataStream:
        reader = spark.read.option("multiLine", self.multiline)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return DataStream(reader.json(self.path))


@dataclass
class JsonSink(Sink):
    path: str
    mode: str = "overwrite"

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        return self._write_df(ds.df, "json", self.path, self.mode, {}, None, parallelism)


# ---------------------------------------------------------------------------
# ORC
# ---------------------------------------------------------------------------

@dataclass
class OrcSource(Source):
    """OrcSource.scala — predicate pushdown via ORC SearchArguments is
    automatic in Spark's ORC reader."""

    path: str

    def to_datastream(self, spark: SparkSession) -> DataStream:
        return DataStream(spark.read.orc(self.path))


@dataclass
class OrcSink(Sink):
    """OrcSink.scala incl. bloom-filter columns option."""

    path: str
    mode: str = "overwrite"
    bloom_filter_columns: list[str] | None = None

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        opts: dict[str, Any] = {}
        if self.bloom_filter_columns:
            opts["orc.bloom.filter.columns"] = ",".join(self.bloom_filter_columns)
        return self._write_df(ds.df, "orc", self.path, self.mode, opts, None, parallelism)


# ---------------------------------------------------------------------------
# Avro (gated: spark-avro jar not bundled in this container)
# ---------------------------------------------------------------------------

class _AvroGate:
    """Resolve a usable Avro format identifier or fail with the exact
    dependency coordinate.

    Two lessons encoded here: (a) probe with Class.forName, not a bare
    ``_jvm`` attribute walk — py4j resolves package paths into lazy
    JavaPackage placeholders without touching the classpath, so the old
    attribute "check" passed even with no jar; (b) the pyspark wheel
    ships the spark-avro CLASSES but not its DataSourceRegister service
    entry, so the short name ``avro`` fails lookup while the provider
    class works — address the class directly."""

    PROVIDER = "org.apache.spark.sql.avro.AvroFileFormat"

    @classmethod
    def format_name(cls, spark: SparkSession) -> str:
        try:
            spark._jvm.java.lang.Class.forName(cls.PROVIDER)
        except Exception:
            raise RuntimeError(
                "Avro support requires the spark-avro package "
                "(org.apache.spark:spark-avro_2.13); add it via "
                "spark.jars.packages."
            ) from None
        return cls.PROVIDER

    @classmethod
    def check(cls, spark: SparkSession) -> None:
        cls.format_name(spark)


@dataclass
class AvroSource(Source):
    """Avro container files (AvroSource.scala:1) via Spark's avro module."""

    path: str

    def to_datastream(self, spark: SparkSession) -> DataStream:
        fmt = _AvroGate.format_name(spark)
        return DataStream(spark.read.format(fmt).load(self.path))


@dataclass
class AvroSink(Sink):
    """Avro container writes (AvroSink.scala:1); rows counted by the
    write-job Observation like every other sink."""

    path: str
    mode: str = "overwrite"

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        fmt = _AvroGate.format_name(ds.df.sparkSession)
        return self._write_df(ds.df, fmt, self.path, self.mode, {}, None, parallelism)


@dataclass
class AvroParquetSource(Source):
    """AvroParquetSource.scala:1 — parquet files read under an Avro-schema
    contract. The storage is plain parquet (no avro jar needed); the Avro
    record JSON drives projection + type alignment via schema_avro's real
    converter, so a consumer holding only an Avro schema gets exactly the
    fields and types it declares."""

    path: str | list[str]
    avro_schema: str | dict | None = None

    def to_datastream(self, spark: SparkSession) -> DataStream:
        ds = ParquetSource(self.path).to_datastream(spark)
        if self.avro_schema is None:
            return ds
        from eel_spark.schema_avro import from_avro_schema

        return ds.align(from_avro_schema(self.avro_schema))


@dataclass
class AvroParquetSink(Sink):
    """AvroParquetSink.scala:1 — write parquet aligned to an Avro-schema
    contract (field order + types from the Avro record)."""

    path: str
    avro_schema: str | dict | None = None
    mode: str = "overwrite"

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        out = ds
        if self.avro_schema is not None:
            from eel_spark.schema_avro import from_avro_schema

            out = ds.align(from_avro_schema(self.avro_schema))
        return self._write_df(out.df, "parquet", self.path, self.mode, {}, None, parallelism)


# ---------------------------------------------------------------------------
# Text / glob / dev-null
# ---------------------------------------------------------------------------

@dataclass
class TextSource(Source):
    """Line-per-row text (the practical stand-in for SequenceSource —
    hadoop sequence files are a JVM-era niche; wholeTextFiles-style
    ingestion is covered by ``whole_file=True``)."""

    path: str
    whole_file: bool = False

    def to_datastream(self, spark: SparkSession) -> DataStream:
        reader = spark.read
        if self.whole_file:
            reader = reader.option("wholetext", "true")
        return DataStream(reader.text(self.path))


@dataclass
class SequenceSource(Source):
    """SequenceSource.scala — Hadoop SequenceFile of (key, value) Text
    pairs. PySpark core reads these without extra jars via the RDD API;
    rows surface as a (key string, value string) DataFrame. The
    reference's CSV-in-sequencefile convention (values are delimited
    records) is honored via ``delimiter``+``columns``."""

    path: str
    delimiter: str | None = None
    columns: list[str] | None = None

    def to_datastream(self, spark: SparkSession) -> DataStream:
        rdd = spark.sparkContext.sequenceFile(self.path)
        df = spark.createDataFrame(
            rdd.map(lambda kv: (str(kv[0]), str(kv[1]))), "key STRING, value STRING"
        )
        if self.delimiter and self.columns:
            # from_csv, not split: SequenceSink serializes with to_csv, so
            # values containing the delimiter arrive quoted and parse back
            # exactly (a naive split would shift every following column)
            schema = ", ".join(f"`{c}` STRING" for c in self.columns)
            parsed = F.from_csv(F.col("value"), F.lit(schema), {"sep": self.delimiter})
            df = df.select(
                *[parsed.getField(c).alias(c) for c in self.columns]
            )
        return DataStream(df)


@dataclass
class SequenceSink(Sink):
    """SequenceSink.scala — write (key, value) Text pairs: key = the
    first column's value, value = the row as one CSV line (``to_csv``:
    JVM-side, so delimiter-containing values are quoted and round-trip
    through SequenceSource instead of shifting columns).

    SCALE WARNING: this is the ONE sink whose rows pass through Python
    (``saveAsSequenceFile`` has no DataFrame path in PySpark), though
    serialization itself stays JVM-side — only the (key, value) string
    pair crosses. Prefer Parquet/ORC for anything measured.

    Exactly-once row count: the pair RDD is persisted, counted, then
    saved — an accumulator inside the map (the previous design) double
    counts on task retry/speculation; count() on the persisted RDD is an
    action with exactly-once semantics and the save reads the cache."""

    path: str
    delimiter: str = ","

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        from pyspark import StorageLevel

        df = ds.df
        if parallelism:
            df = df.repartition(parallelism)
        pair_df = df.select(
            F.col(df.columns[0]).cast("string").alias("__k"),
            F.to_csv(F.struct(*df.columns), {"sep": self.delimiter}).alias("__v"),
        )
        rdd = pair_df.rdd.map(lambda r: (r[0], r[1]))
        rdd.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n = rdd.count()
            rdd.saveAsSequenceFile(self.path)
        finally:
            rdd.unpersist()
        return n


@dataclass
class FilePattern(Source):
    """FilePattern.scala: glob expansion with filtering."""

    pattern: str
    format: str = "parquet"
    path_glob_filter: str | None = None
    recursive: bool = False

    def to_datastream(self, spark: SparkSession) -> DataStream:
        reader = spark.read.format(self.format)
        if self.path_glob_filter:
            reader = reader.option("pathGlobFilter", self.path_glob_filter)
        if self.recursive:
            reader = reader.option("recursiveFileLookup", "true")
        return DataStream(reader.load(self.pattern))


class DevNullSink(Sink):
    """DevNullSink.scala → the noop format (full execution, no output)."""

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        return self._write_df(ds.df, "noop", None, "overwrite", {}, None, parallelism)
