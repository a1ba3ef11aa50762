"""Schema layer — the eel datatype lattice re-expressed on Spark types.

Reference: eel-schema/src/main/scala/io/eels/schema/schema.scala (datatypes),
Field.scala (Field/metadata/nullable), SchemaFn.scala (JVM value → datatype),
SchemaMerger.scala (field-union merge).

We keep the reference's *model* (named, ordered, nullable fields with a
closed datatype lattice) but store it as a native Spark ``StructType`` so
every operator stays inside Catalyst.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import re
from typing import Any, Iterable

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# eel datatype name <-> Spark type (schema.scala sealed trait DataType)
# ---------------------------------------------------------------------------

_EEL_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.DecimalType(38, 0),  # eel BigIntType = unbounded integer
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "char": T.StringType(),
    "varchar": T.StringType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamp_millis": T.TimestampType(),
    "timestamp_micros": T.TimestampType(),
    "time_millis": T.LongType(),
    "time_micros": T.LongType(),
    "enum": T.StringType(),
}

_DECIMAL_RE = re.compile(r"decimal\((\d+)\s*,\s*(\d+)\)")


def eel_type(name: str) -> T.DataType:
    """Resolve an eel datatype name (e.g. ``"decimal(38,5)"``) to Spark."""
    n = name.strip().lower()
    m = _DECIMAL_RE.fullmatch(n)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if n.startswith("array<") and n.endswith(">"):
        return T.ArrayType(eel_type(n[6:-1]))
    try:
        return _EEL_TO_SPARK[n]
    except KeyError:
        raise ValueError(f"Unknown eel datatype: {name}") from None


def field(name: str, datatype: str | T.DataType = "string", nullable: bool = True) -> T.StructField:
    """eel ``Field(name, datatype, nullable)`` → Spark StructField."""
    dt = eel_type(datatype) if isinstance(datatype, str) else datatype
    return T.StructField(name, dt, nullable)


def struct(*fields: T.StructField | str) -> T.StructType:
    """eel ``StructType(fields...)``; bare strings become string fields."""
    return T.StructType([field(f) if isinstance(f, str) else f for f in fields])


# ---------------------------------------------------------------------------
# SchemaFn: infer a Spark type from a Python value (SchemaFn.scala:toDataType)
# ---------------------------------------------------------------------------

def infer_type(value: Any) -> T.DataType:
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, _decimal.Decimal):
        sign, digits, exp = value.as_tuple()
        scale = max(0, -exp)
        # integer digits must include a POSITIVE exponent's zeros:
        # Decimal('1E+5') is (digits=(1,), exp=5) = 100000 → 6 int digits,
        # not 1 (the old max(len(digits), scale)+1 yielded Decimal(2,0))
        int_digits = max(len(digits) + exp, 1) if exp > 0 else max(
            len(digits) - scale, 1
        )
        return T.DecimalType(min(38, int_digits + scale + 1), scale)
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, (bytes, bytearray)):
        return T.BinaryType()
    if isinstance(value, _dt.datetime):
        return T.TimestampType()
    if isinstance(value, _dt.date):
        return T.DateType()
    if isinstance(value, (list, tuple)) and value:
        return T.ArrayType(infer_type(value[0]))
    if isinstance(value, dict) and value:
        k, v = next(iter(value.items()))
        return T.MapType(infer_type(k), infer_type(v))
    return T.StringType()


def infer_schema(names: Iterable[str], rows: Iterable[Iterable[Any]]) -> T.StructType:
    """Infer a schema from values, WIDENING across rows: a column seen as
    [1, 2.5] infers double, not the first row's long (locking to the
    first value makes createDataFrame reject later rows)."""
    names = list(names)
    types: list[T.DataType | None] = [None] * len(names)
    for row in rows:
        for i, v in enumerate(row):
            if v is None:
                continue
            t = infer_type(v)
            types[i] = t if types[i] is None else _widen(types[i], t)
    return T.StructType(
        [T.StructField(n, t or T.StringType(), True) for n, t in zip(names, types)]
    )


# ---------------------------------------------------------------------------
# SchemaMerger.scala — field-union merge with numeric widening
# ---------------------------------------------------------------------------

_WIDEN_ORDER = [
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
]


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    if a in _WIDEN_ORDER and b in _WIDEN_ORDER:
        return _WIDEN_ORDER[max(_WIDEN_ORDER.index(a), _WIDEN_ORDER.index(b))]
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        scale = max(a.scale, b.scale)
        whole = max(a.precision - a.scale, b.precision - b.scale)
        if whole + scale > 38:
            # when capped, sacrifice SCALE, never integer digits (Spark's
            # own promotion rule): keeping max scale would silently shrink
            # integer capacity below an input's and overflow legal values
            scale = max(0, 38 - whole)
        return T.DecimalType(min(38, whole + scale), scale)
    return T.StringType()


def merge_schemas(*schemas: T.StructType) -> T.StructType:
    """Union of fields across schemas; shared names get widened types.

    A field absent from ANY input schema is forced nullable: rows from a
    source without the field are necessarily null there, so a preserved
    nullable=False would mis-declare the merged data to writers and
    validators."""
    out: list[T.StructField] = []
    index: dict[str, int] = {}
    seen_in: dict[str, int] = {}
    for schema in schemas:
        for f in schema.fields:
            seen_in[f.name] = seen_in.get(f.name, 0) + 1
            if f.name in index:
                prev = out[index[f.name]]
                out[index[f.name]] = T.StructField(
                    f.name, _widen(prev.dataType, f.dataType), prev.nullable or f.nullable
                )
            else:
                index[f.name] = len(out)
                out.append(f)
    n = len(schemas)
    return T.StructType(
        [
            f if seen_in[f.name] == n else T.StructField(f.name, f.dataType, True)
            for f in out
        ]
    )


# ---------------------------------------------------------------------------
# Rule-based header inference (SchemaInferrer.scala:6)
# ---------------------------------------------------------------------------

class DataTypeRule:
    """SchemaInferrer.scala DataTypeRule: first regex that fully matches a
    header name decides the column's type (and nullability)."""

    def __init__(self, pattern: str, datatype: str | T.DataType, nullable: bool = True):
        self.regex = re.compile(pattern)
        self.datatype = eel_type(datatype) if isinstance(datatype, str) else datatype
        self.nullable = nullable

    def match(self, header: str) -> T.StructField | None:
        if self.regex.fullmatch(header):
            return T.StructField(header, self.datatype, self.nullable)
        return None


class SchemaInferrer:
    """SchemaInferrer.scala:6 — map header-name patterns to types without a
    data scan: ``SchemaInferrer("string", DataTypeRule(".*_id", "long",
    nullable=False))``. Rules are tried in order; the default type applies
    when none matches.

    Unlike Spark's ``inferSchema`` (which samples/scans the data — an extra
    pass that costs a full read at 100 TB), this is metadata-only: the type
    is a pure function of the header name."""

    def __init__(self, default: str | T.DataType = "string", *rules: DataTypeRule):
        self.default = eel_type(default) if isinstance(default, str) else default
        self.rules = list(rules)

    def infer(self, headers: Iterable[str]) -> T.StructType:
        fields: list[T.StructField] = []
        for h in headers:
            for rule in self.rules:
                f = rule.match(h)
                if f is not None:
                    fields.append(f)
                    break
            else:
                fields.append(T.StructField(h, self.default, True))
        return T.StructType(fields)


def flatten_structs(df, sep: str = "_", max_depth: int | None = None):
    """Recursively expand nested struct columns into flat top-level
    columns named ``parent<sep>child<sep>...`` — the standard ingest
    normalization for JSON-shaped data before columnar analytics
    (nested structs defeat many pushdowns and most BI consumers).

    Arrays and maps pass through unexpanded (flattening them changes
    row multiplicity — explode is a separate, deliberate step). Leaf
    ORDER follows a depth-first walk of the schema. Generated names
    that collide with an existing column (or each other) raise rather
    than silently shadowing. Pure projection: no shuffle, zero cost
    beyond the select itself, and column pruning still reaches the
    scan for any subset of flattened leaves.
    """
    from pyspark.sql import functions as F

    def leaves(schema: T.StructType, path: list[str], depth: int):
        out = []
        for f in schema.fields:
            p = path + [f.name]
            expandable = (
                isinstance(f.dataType, T.StructType)
                and len(f.dataType.fields) > 0  # empty struct: pass whole,
                and (max_depth is None or depth < max_depth)  # never vanish
            )
            if expandable:
                out.extend(leaves(f.dataType, p, depth + 1))
            else:
                ref = F.col(".".join("`%s`" % part.replace("`", "``") for part in p))
                out.append((sep.join(p), ref))
        return out

    cols = leaves(df.schema, [], 0)
    # casefolded collision check: Spark resolves names
    # case-insensitively by default, so 'A_b' vs 'a_b' would pass a
    # case-sensitive check yet be AMBIGUOUS_REFERENCE downstream
    seen: dict[str, int] = {}
    for name, _ in cols:
        key = name.casefold()
        seen[key] = seen.get(key, 0) + 1
    dup = sorted(n for n, k in seen.items() if k > 1)
    if dup:
        raise ValueError(
            f"flattening with sep={sep!r} collides on {dup} "
            "(case-insensitive, matching Spark's default resolution); "
            "pick a different separator (silent shadowing would drop data)"
        )
    return df.select(*[ref.alias(name) for name, ref in cols])
