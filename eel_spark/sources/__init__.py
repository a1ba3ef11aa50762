from eel_spark.sources.connectors import (
    ConnectorMissing,
    ElasticsearchSink,
    ElasticsearchSource,
    HBaseSink,
    HBaseSource,
    KuduSink,
    KuduSource,
)
from eel_spark.sources.files import (
    AvroParquetSink,
    AvroParquetSource,
    AvroSink,
    AvroSource,
    CsvSink,
    CsvSource,
    DevNullSink,
    FilePattern,
    JsonSink,
    JsonSource,
    OrcSink,
    OrcSource,
    ParquetSink,
    ParquetSource,
    SequenceSink,
    SequenceSource,
    TextSource,
)
from eel_spark.sources.hive import HiveSink, HiveSource, HiveTable
from eel_spark.sources.warc import WarcSource, write_warc
from eel_spark.sources.jdbc import (
    BucketPartitionStrategy,
    HashPartitionStrategy,
    JdbcSink,
    JdbcSource,
    JdbcStoredProcSource,
    RangePartitionStrategy,
    SinglePartitionStrategy,
)
from eel_spark.sources.kafka import KafkaSink, KafkaSource

__all__ = [
    "ParquetSource", "ParquetSink", "CsvSource", "CsvSink", "JsonSource",
    "JsonSink", "OrcSource", "OrcSink", "AvroSource", "AvroSink", "AvroParquetSource", "AvroParquetSink",
    "TextSource", "SequenceSource", "SequenceSink", "FilePattern", "DevNullSink",
    "HiveSource", "HiveSink", "HiveTable",
    "JdbcSource", "JdbcSink", "JdbcStoredProcSource", "RangePartitionStrategy",
    "HashPartitionStrategy", "BucketPartitionStrategy",
    "SinglePartitionStrategy",
    "KafkaSource", "KafkaSink",
    "WarcSource", "write_warc",
    "HBaseSource", "HBaseSink", "KuduSource", "KuduSink",
    "ElasticsearchSource", "ElasticsearchSink", "ConnectorMissing",
]
