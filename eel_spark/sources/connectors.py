"""Connector-gated sources/sinks: HBase, Kudu, Elasticsearch.

Reference: eel-hbase, eel-kudu, eel-elasticsearch components. Their jars
(shc / kudu-spark / elasticsearch-hadoop) are not in this container, so
each class is a *gate*: the full option surface is wired to the Spark
DataSource V2 format names the real connectors register, and construction
fails fast with the exact package coordinate needed. On a cluster with
the jar present the same code runs unchanged.

Pushdown notes per connector are in each docstring — these matter at
100 TB because a connector scan that can't push predicates turns a keyed
lookup into a full-table stream.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import SparkSession

from eel_spark.datastream import DataStream
from eel_spark.sources.files import Sink, Source


class ConnectorMissing(RuntimeError):
    def __init__(self, fmt: str, package: str):
        super().__init__(
            f"Spark data source format '{fmt}' is not available in this "
            f"environment. Add the connector package: "
            f"spark.jars.packages={package}"
        )


def _gate(spark: SparkSession, fmt: str, package: str) -> None:
    try:
        spark.read.format(fmt).options().load()
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if "ClassNotFoundException" in msg or "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
            raise ConnectorMissing(fmt, package) from None
        # format exists; the failure is just missing options/path — fine
        return


@dataclass
class HBaseSource(Source):
    """eel-hbase HBaseSource. Format: the HBase-Spark connector
    (``org.apache.hadoop.hbase.spark``).

    Pushdown: rowkey range + column filters push into HBase scans; the
    connector maps partitions to region boundaries, so a rowkey-prefix
    filter prunes regions the way partition pruning prunes files.
    """

    table: str
    catalog: str | None = None  # JSON schema-mapping (shc-style)
    options: dict[str, Any] = dc_field(default_factory=dict)

    PACKAGE = "org.apache.hbase.connectors.spark:hbase-spark:1.0.1"

    def to_datastream(self, spark: SparkSession) -> DataStream:
        _gate(spark, "org.apache.hadoop.hbase.spark", self.PACKAGE)
        reader = spark.read.format("org.apache.hadoop.hbase.spark").option(
            "hbase.table", self.table
        )
        if self.catalog:
            reader = reader.option("catalog", self.catalog)
        return DataStream(reader.options(**self.options).load())


@dataclass
class HBaseSink(Sink):
    table: str
    options: dict[str, Any] = dc_field(default_factory=dict)

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        _gate(ds.df.sparkSession, "org.apache.hadoop.hbase.spark", HBaseSource.PACKAGE)
        df = ds.df.repartition(parallelism) if parallelism else ds.df
        observed, obs = self._observed(df)
        observed.write.format("org.apache.hadoop.hbase.spark").option(
            "hbase.table", self.table
        ).options(**self.options).save()
        return int(obs.get["rows"])


@dataclass
class KuduSource(Source):
    """eel-kudu KuduSource. Format ``kudu`` (kudu-spark3).

    Pushdown: Kudu scans accept predicate + projection natively; hash/
    range partition pruning happens server-side from pushed predicates —
    assert via .explain PushedFilters like any V2 source.
    """

    table: str
    master: str = "localhost:7051"

    PACKAGE = "org.apache.kudu:kudu-spark3_2.13:1.17.0"

    def to_datastream(self, spark: SparkSession) -> DataStream:
        _gate(spark, "kudu", self.PACKAGE)
        return DataStream(
            spark.read.format("kudu")
            .option("kudu.master", self.master)
            .option("kudu.table", self.table)
            .load()
        )


@dataclass
class KuduSink(Sink):
    table: str
    master: str = "localhost:7051"
    mode: str = "append"

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        _gate(ds.df.sparkSession, "kudu", KuduSource.PACKAGE)
        df = ds.df.repartition(parallelism) if parallelism else ds.df
        observed, obs = self._observed(df)
        observed.write.format("kudu").option("kudu.master", self.master).option(
            "kudu.table", self.table
        ).mode(self.mode).save()
        return int(obs.get["rows"])


@dataclass
class ElasticsearchSource(Source):
    """eel-elasticsearch. Format ``org.elasticsearch.spark.sql`` (es-hadoop).

    Pushdown: es-hadoop translates filters to ES query DSL
    (``es.query`` merge) and maps one Spark partition per shard — the
    shard count IS the parallelism, so index sharding is the 100 TB knob.
    """

    index: str
    nodes: str = "localhost:9200"
    query: str | None = None

    PACKAGE = "org.elasticsearch:elasticsearch-spark-30_2.13:8.13.4"

    def to_datastream(self, spark: SparkSession) -> DataStream:
        _gate(spark, "org.elasticsearch.spark.sql", self.PACKAGE)
        reader = spark.read.format("org.elasticsearch.spark.sql").option(
            "es.nodes", self.nodes
        )
        if self.query:
            reader = reader.option("es.query", self.query)
        return DataStream(reader.load(self.index))


@dataclass
class ElasticsearchSink(Sink):
    index: str
    nodes: str = "localhost:9200"
    mode: str = "append"

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        _gate(ds.df.sparkSession, "org.elasticsearch.spark.sql", ElasticsearchSource.PACKAGE)
        df = ds.df.repartition(parallelism) if parallelism else ds.df
        observed, obs = self._observed(df)
        observed.write.format("org.elasticsearch.spark.sql").option(
            "es.nodes", self.nodes
        ).mode(self.mode).save(self.index)
        return int(obs.get["rows"])
