"""Kafka sink (the reference ships sink-only: eel-kafka/KafkaSink.scala)
plus a source for parity with Spark's capabilities.

Structured-streaming mapping: batch writes use ``df.write.format("kafka")``
(each executor partition produces to the broker in parallel); streaming
uses read/writeStream. Gated: no broker or kafka-sql jar in this
container — construction validates config, execution raises with the
dependency note.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from eel_spark.datastream import DataStream
from eel_spark.sources.files import Sink, Source


def _to_kafka_frame(ds: DataStream, key_col: str | None) -> DataStream:
    """Serialize arbitrary rows to the kafka (key, value) contract:
    value = JSON of the row (KafkaSink.scala uses a pluggable serializer;
    JSON is its default via JsonRow)."""
    df = ds.df
    value = F.to_json(F.struct(*df.columns)).alias("value")
    if key_col:
        return DataStream(df.select(F.col(key_col).cast("string").alias("key"), value))
    return DataStream(df.select(value))


@dataclass
class KafkaSink(Sink):
    bootstrap_servers: str
    topic: str
    key_col: str | None = None

    def write(self, ds: DataStream, parallelism: int | None = None) -> int:
        frame = _to_kafka_frame(ds, self.key_col)
        df = frame.df
        if parallelism:
            df = df.repartition(parallelism)
        observed, obs = self._observed(df)
        try:
            (
                observed.write.format("kafka")
                .option("kafka.bootstrap.servers", self.bootstrap_servers)
                .option("topic", self.topic)
                .save()
            )
        except Exception as e:  # pragma: no cover - no broker in container
            raise RuntimeError(
                "Kafka writes need the spark-sql-kafka package and a broker "
                "(org.apache.spark:spark-sql-kafka-0-10_2.13); the frame "
                "serialization above is tested without one."
            ) from e
        return int(obs.get["rows"])


@dataclass
class KafkaSource(Source):
    bootstrap_servers: str
    topic: str
    starting_offsets: str = "earliest"

    def to_datastream(self, spark: SparkSession) -> DataStream:
        try:
            df = (
                spark.read.format("kafka")
                .option("kafka.bootstrap.servers", self.bootstrap_servers)
                .option("subscribe", self.topic)
                .option("startingOffsets", self.starting_offsets)
                .load()
            )
        except Exception as e:  # pragma: no cover
            raise RuntimeError(
                "Kafka reads need the spark-sql-kafka package and a broker."
            ) from e
        return DataStream(
            df.select(
                F.col("key").cast("string"),
                F.col("value").cast("string"),
                "topic", "partition", "offset", "timestamp",
            )
        )
