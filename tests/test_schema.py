"""Schema layer (SURVEY.md §2.2): eel datatype lattice, value inference,
SchemaMerger widening."""

from __future__ import annotations

import datetime
import decimal

import pytest
from pyspark.sql import types as T

from eel_spark.schema import (
    eel_type, field, infer_schema, infer_type, merge_schemas, struct,
)


def test_eel_type_lattice():
    assert eel_type("int") == T.IntegerType()
    assert eel_type("timestamp_millis") == T.TimestampType()
    assert eel_type("decimal(12,3)") == T.DecimalType(12, 3)
    assert eel_type("bigint") == T.DecimalType(38, 0)
    assert eel_type("array<long>") == T.ArrayType(T.LongType())
    assert eel_type("varchar") == T.StringType()
    with pytest.raises(ValueError):
        eel_type("quaternion")


def test_field_and_struct():
    f = field("age", "int", nullable=False)
    assert f == T.StructField("age", T.IntegerType(), False)
    s = struct("name", field("age", "int"))
    assert s.fieldNames() == ["name", "age"]
    assert s["name"].dataType == T.StringType()


def test_infer_type():
    assert infer_type(True) == T.BooleanType()
    assert infer_type(3) == T.LongType()
    assert infer_type(3.5) == T.DoubleType()
    assert infer_type("x") == T.StringType()
    assert infer_type(b"x") == T.BinaryType()
    assert infer_type(datetime.datetime(2024, 1, 1)) == T.TimestampType()
    assert infer_type(datetime.date(2024, 1, 1)) == T.DateType()
    assert infer_type(decimal.Decimal("12.345")) == T.DecimalType(6, 3)
    assert infer_type([1, 2]) == T.ArrayType(T.LongType())
    assert infer_type({"a": 1}) == T.MapType(T.StringType(), T.LongType())


def test_infer_schema_skips_nulls():
    s = infer_schema(["a", "b"], [(None, 1), ("x", 2)])
    assert s["a"].dataType == T.StringType()
    assert s["b"].dataType == T.LongType()


def test_merge_schemas_union_and_widen():
    a = struct(field("id", "int"), field("name", "string"))
    b = struct(field("id", "long"), field("score", "double"))
    merged = merge_schemas(a, b)
    assert merged.fieldNames() == ["id", "name", "score"]
    assert merged["id"].dataType == T.LongType()  # int widened to long


def test_merge_schemas_decimal_and_conflict():
    a = struct(field("d", "decimal(10,2)"), field("x", "int"))
    b = struct(field("d", "decimal(12,4)"), field("x", "string"))
    merged = merge_schemas(a, b)
    assert merged["d"].dataType == T.DecimalType(12, 4)
    assert merged["x"].dataType == T.StringType()  # incompatible -> string


def test_infer_schema_widens_across_rows(spark):
    from eel_spark.schema import infer_schema
    from pyspark.sql import types as T

    s = infer_schema(["x"], [(1,), (2.5,)])
    assert s["x"].dataType == T.DoubleType()
    # and the full constructor coerces + fits the data end to end
    from eel_spark.datastream import from_values

    ds = from_values(spark, ["x"], [(1,), (2.5,)])
    assert sorted(r["x"] for r in ds.collect()) == [1.0, 2.5]


def test_infer_positive_exponent_decimal():
    import decimal

    from eel_spark.schema import infer_type

    dt = infer_type(decimal.Decimal("1E+5"))
    assert dt.precision - dt.scale >= 6  # must hold 100000


def test_decimal_widen_keeps_integer_digits():
    from eel_spark.schema import _widen
    from pyspark.sql import types as T

    got = _widen(T.DecimalType(38, 0), T.DecimalType(20, 10))
    assert got.precision - got.scale >= 38  # integer capacity preserved


def test_merge_forces_nullable_for_absent_fields():
    from eel_spark.schema import merge_schemas
    from pyspark.sql import types as T

    a = T.StructType([T.StructField("x", T.LongType(), False)])
    b = T.StructType([T.StructField("y", T.LongType(), False)])
    merged = merge_schemas(a, b)
    assert merged["x"].nullable and merged["y"].nullable


def test_flatten_structs(spark):
    from eel_spark.schema import flatten_structs

    df = spark.createDataFrame(
        [(1, ("x", (2.5, True)), ["a", "b"])],
        "id LONG, s STRUCT<name:STRING, inner:STRUCT<v:DOUBLE, flag:BOOLEAN>>, tags ARRAY<STRING>",
    )
    flat = flatten_structs(df)
    assert flat.columns == ["id", "s_name", "s_inner_v", "s_inner_flag", "tags"]
    r = flat.collect()[0]
    assert (r["id"], r["s_name"], r["s_inner_v"], r["s_inner_flag"]) == (1, "x", 2.5, True)
    assert r["tags"] == ["a", "b"]  # arrays pass through

    # depth cap keeps the sub-struct whole
    capped = flatten_structs(df, max_depth=1)
    assert "s_inner" in capped.columns

    # collision detection
    df2 = spark.createDataFrame([((1,), 2)], "a STRUCT<b:LONG>, a_b LONG")
    import pytest as _p

    with _p.raises(ValueError, match="collides"):
        flatten_structs(df2)


def test_flatten_structs_case_insensitive_collision_and_empty_struct(spark):
    from eel_spark.schema import flatten_structs

    import pytest as _p

    # 'A'.b flattens to A_b which collides case-insensitively with a_b
    df = spark.createDataFrame([((1,), 2)], "A STRUCT<b:LONG>, a_b LONG")
    with _p.raises(ValueError, match="case-insensitive"):
        flatten_structs(df)

    # empty struct column passes through whole instead of vanishing
    from pyspark.sql import types as T

    empty = spark.createDataFrame(
        [], T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StructType([])),
        ])
    )
    assert flatten_structs(empty).columns == ["id", "s"]
