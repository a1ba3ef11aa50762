"""Avro schema ⇄ Spark schema conversion (AvroSchemaFns parity —
pure schema logic, independent of the gated .avro format jar)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from eel_spark.schema_avro import from_avro_schema, to_avro_schema

AVRO = {
    "type": "record",
    "name": "person",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "born", "type": {"type": "int", "logicalType": "date"}},
        {"name": "seen", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "balance",
         "type": {"type": "bytes", "logicalType": "decimal",
                  "precision": 12, "scale": 2}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": ["null", "long"]}},
        {"name": "status", "type": {"type": "enum", "name": "s",
                                    "symbols": ["A", "B"]}},
        {"name": "address", "type": {
            "type": "record", "name": "addr",
            "fields": [{"name": "city", "type": "string"}],
        }},
    ],
}


def test_from_avro_schema():
    s = from_avro_schema(AVRO)
    assert s["id"] == T.StructField("id", T.LongType(), False)
    assert s["name"] == T.StructField("name", T.StringType(), True)
    assert s["born"].dataType == T.DateType()
    assert s["seen"].dataType == T.TimestampType()
    assert s["balance"].dataType == T.DecimalType(12, 2)
    assert s["tags"].dataType == T.ArrayType(T.StringType(), False)
    assert s["attrs"].dataType == T.MapType(T.StringType(), T.LongType(), True)
    assert s["status"].dataType == T.StringType()
    assert s["address"].dataType == T.StructType(
        [T.StructField("city", T.StringType(), False)]
    )


def test_from_avro_json_string():
    s = from_avro_schema(json.dumps(AVRO))
    assert s.fieldNames()[0] == "id"


def test_roundtrip_via_avro_json():
    spark_schema = T.StructType([
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.StringType(), True),
        T.StructField("c", T.ArrayType(T.DoubleType(), False), False),
        T.StructField("d", T.DecimalType(10, 3), True),
        T.StructField("ts", T.TimestampType(), True),
    ])
    back = from_avro_schema(to_avro_schema(spark_schema))
    assert back == spark_schema


def test_roundtrip_on_real_table(spark):
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    back = from_avro_schema(to_avro_schema(src.schema))
    assert [f.name for f in back.fields] == src.columns
    # the exact timestamp flavor (TZ vs NTZ) survives the round trip
    assert (
        dict((f.name, f.dataType) for f in back.fields)["o_orderdate"]
        == src.schema["o_orderdate"].dataType
    )
