"""Avro schema ⇄ Spark schema conversion (pure Python, no format jar).

Reference: eel-avro AvroSchemaFns.scala (toAvroSchema / fromAvroSchema).
The spark-avro *format* jar is absent in this container (reading .avro
files is gated in sources/files.py), but schema conversion is plain JSON
manipulation — it covers the reference's AvroParquet path, where Avro
RECORDS define the schema and parquet carries the data.

Supported: all Avro primitives, records (nested), arrays, maps,
null-unions (→ nullable), logical types date / timestamp-millis /
timestamp-micros / decimal(p,s) / uuid, enums (→ string), fixed (→
binary).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
    "null": T.NullType(),
}

_LOGICAL: dict[str, T.DataType] = {
    "date": T.DateType(),
    "timestamp-millis": T.TimestampType(),
    "timestamp-micros": T.TimestampType(),
    "local-timestamp-millis": T.TimestampNTZType(),
    "local-timestamp-micros": T.TimestampNTZType(),
    "time-millis": T.LongType(),
    "time-micros": T.LongType(),
    "uuid": T.StringType(),
}


def avro_to_spark_type(avro: Any) -> tuple[T.DataType, bool]:
    """Resolve an Avro type node → (Spark type, nullable)."""
    if isinstance(avro, str):
        if avro not in _PRIMITIVES:
            raise ValueError(f"Unknown avro primitive: {avro}")
        return _PRIMITIVES[avro], avro == "null"
    if isinstance(avro, list):  # union — nullable iff "null" is a branch
        branches = [b for b in avro if b != "null"]
        nullable = len(branches) != len(avro)
        if not branches:
            return T.NullType(), True
        if len(branches) > 1:
            return T.StringType(), nullable  # heterogeneous union → string
        inner, _ = avro_to_spark_type(branches[0])
        return inner, nullable
    if isinstance(avro, dict):
        logical = avro.get("logicalType")
        if logical == "decimal":
            return T.DecimalType(avro.get("precision", 38), avro.get("scale", 0)), False
        if logical in _LOGICAL:
            return _LOGICAL[logical], False
        kind = avro["type"]
        if kind == "record":
            return avro_record_to_struct(avro), False
        if kind == "array":
            item, item_null = avro_to_spark_type(avro["items"])
            return T.ArrayType(item, containsNull=item_null), False
        if kind == "map":
            val, val_null = avro_to_spark_type(avro["values"])
            return T.MapType(T.StringType(), val, valueContainsNull=val_null), False
        if kind == "enum":
            return T.StringType(), False
        if kind == "fixed":
            return T.BinaryType(), False
        return avro_to_spark_type(kind)  # {"type": "string"} wrapper form
    raise ValueError(f"Unsupported avro node: {avro!r}")


def avro_record_to_struct(record: dict) -> T.StructType:
    if record.get("type") != "record":
        raise ValueError("Top-level avro schema must be a record")
    fields = []
    for f in record["fields"]:
        dt, nullable = avro_to_spark_type(f["type"])
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


def from_avro_schema(schema: str | dict) -> T.StructType:
    """Avro record schema (JSON string or dict) → Spark StructType."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    return avro_record_to_struct(schema)


# -- reverse direction ------------------------------------------------------

def _spark_to_avro_type(dt: T.DataType) -> Any:
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes", "logicalType": "decimal",
            "precision": dt.precision, "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        item = _spark_to_avro_type(dt.elementType)
        return {"type": "array",
                "items": ["null", item] if dt.containsNull else item}
    if isinstance(dt, T.MapType):
        val = _spark_to_avro_type(dt.valueType)
        return {"type": "map",
                "values": ["null", val] if dt.valueContainsNull else val}
    if isinstance(dt, T.StructType):
        return _struct_to_record(dt, name="nested")
    raise ValueError(f"No avro mapping for {dt}")


def _struct_to_record(schema: T.StructType, name: str) -> dict:
    fields = []
    for f in schema.fields:
        at = _spark_to_avro_type(f.dataType)
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return {"type": "record", "name": name, "fields": fields}


def to_avro_schema(schema: T.StructType, name: str = "row") -> str:
    """Spark StructType → Avro record schema JSON (AvroSchemaFns.toAvroSchema)."""
    return json.dumps(_struct_to_record(schema, name))
