"""Type system: KType <-> Spark SQL types.

Reimplements the reference's closed type set (kinds/ktype.go:13-34, Go->KSQL
mapping ToKsql ktype.go:38-141) on top of Spark's type system, plus one
documented extension: TIMESTAMP.  The reference treats timestamps as metadata
only (ksql/metadata.go:13-16) because ksqlDB tracks event time server-side;
a native engine needs a first-class event-time column for watermarks
(BASELINE.json input_hint mandates ``ts: timestamp``).

Unsupported-by-design (as in the reference, ktype.go:116-137): unsigned ints,
decimal, date, interval, nested structs. Map keys are string-only
(ktype.go:62-66).
"""

from __future__ import annotations

import enum

from pyspark.sql import types as T

from .errors import UnsupportedTypeError


class KType(enum.Enum):
    """Closed set of engine types (reference: kinds/ktype.go:13-34 + TIMESTAMP ext)."""

    BOOL = "BOOLEAN"
    INT = "INT"
    BIGINT = "BIGINT"
    DOUBLE = "DOUBLE"
    STRING = "VARCHAR"
    BYTES = "BYTES"
    TIMESTAMP = "TIMESTAMP"  # engine extension, documented in SURVEY.md §1.2
    ARR_BOOL = "ARRAY<BOOLEAN>"
    ARR_INT = "ARRAY<INT>"
    ARR_BIGINT = "ARRAY<BIGINT>"
    ARR_DOUBLE = "ARRAY<DOUBLE>"
    ARR_STRING = "ARRAY<VARCHAR>"
    ARR_BYTES = "ARRAY<BYTES>"
    ARR_FLOAT = "ARRAY<FLOAT>"  # engine extension: embedding vectors
    MAP_BOOL = "MAP<VARCHAR, BOOLEAN>"
    MAP_INT = "MAP<VARCHAR, INT>"
    MAP_BIGINT = "MAP<VARCHAR, BIGINT>"
    MAP_DOUBLE = "MAP<VARCHAR, DOUBLE>"
    MAP_STRING = "MAP<VARCHAR, VARCHAR>"
    MAP_BYTES = "MAP<VARCHAR, BYTES>"


_KTYPE_TO_SPARK: dict[KType, T.DataType] = {
    KType.BOOL: T.BooleanType(),
    KType.INT: T.IntegerType(),
    KType.BIGINT: T.LongType(),
    KType.DOUBLE: T.DoubleType(),
    KType.STRING: T.StringType(),
    KType.BYTES: T.BinaryType(),
    KType.TIMESTAMP: T.TimestampType(),
    KType.ARR_BOOL: T.ArrayType(T.BooleanType()),
    KType.ARR_INT: T.ArrayType(T.IntegerType()),
    KType.ARR_BIGINT: T.ArrayType(T.LongType()),
    KType.ARR_DOUBLE: T.ArrayType(T.DoubleType()),
    KType.ARR_STRING: T.ArrayType(T.StringType()),
    KType.ARR_BYTES: T.ArrayType(T.BinaryType()),
    KType.ARR_FLOAT: T.ArrayType(T.FloatType()),
    KType.MAP_BOOL: T.MapType(T.StringType(), T.BooleanType()),
    KType.MAP_INT: T.MapType(T.StringType(), T.IntegerType()),
    KType.MAP_BIGINT: T.MapType(T.StringType(), T.LongType()),
    KType.MAP_DOUBLE: T.MapType(T.StringType(), T.DoubleType()),
    KType.MAP_STRING: T.MapType(T.StringType(), T.StringType()),
    KType.MAP_BYTES: T.MapType(T.StringType(), T.BinaryType()),
}

_SPARK_TO_KTYPE: dict[str, KType] = {
    dt.simpleString(): kt for kt, dt in _KTYPE_TO_SPARK.items()
}


def to_spark(ktype: KType) -> T.DataType:
    return _KTYPE_TO_SPARK[ktype]


def from_spark(dtype: T.DataType) -> KType:
    """Map a Spark type back into the closed KType set.

    Raises UnsupportedTypeError for anything outside the set — mirroring
    the reference's rejection of unsupported Go kinds (ktype.go:116-137).
    """
    # Widen a few common-but-narrower Spark types the same way the
    # reference widens Go int8/16/32 -> INT (ktype.go:44-52).
    if isinstance(dtype, (T.ByteType, T.ShortType)):
        return KType.INT
    if isinstance(dtype, T.FloatType):
        return KType.DOUBLE
    if isinstance(dtype, T.TimestampNTZType):
        return KType.TIMESTAMP
    kt = _SPARK_TO_KTYPE.get(dtype.simpleString())
    if kt is None:
        raise UnsupportedTypeError(f"unsupported type: {dtype.simpleString()}")
    return kt


class SchemaField:
    """One declared column (reference: schema.SearchField, internal/schema/inspector.go:14-21)."""

    __slots__ = ("name", "ktype", "is_primary")

    def __init__(self, name: str, ktype: KType, is_primary: bool = False):
        self.name = name
        self.ktype = ktype
        self.is_primary = is_primary

    def to_struct_field(self) -> T.StructField:
        return T.StructField(self.name, to_spark(self.ktype), nullable=not self.is_primary)

    def __repr__(self) -> str:  # pragma: no cover
        pk = ", primary" if self.is_primary else ""
        return f"SchemaField({self.name}: {self.ktype.value}{pk})"

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, SchemaField)
            and self.name == other.name
            and self.ktype == other.ktype
            and self.is_primary == other.is_primary
        )


def fields_to_struct(fields: list[SchemaField]) -> T.StructType:
    return T.StructType([f.to_struct_field() for f in fields])


def struct_to_fields(schema: T.StructType, primary_key: str | None = None) -> list[SchemaField]:
    return [
        SchemaField(f.name, from_spark(f.dataType), is_primary=(f.name == primary_key))
        for f in schema.fields
    ]
