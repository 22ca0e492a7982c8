"""Dtype-strict Spark ↔ DuckDB oracle schema comparison.

The driver's correctness gate hashes values through pandas, where dtype
matters: a DuckDB HUGEINT (``SUM(int)``, window ``SUM`` etc.) round-trips
as an object/decimal column and hash-mismatches a Spark BIGINT even when
every value is identical.  This module classifies both sides into coarse
dtype classes and flags any pairing the gate would punish, so the class
of bug can be caught locally (``tools/compare_oracle.py``) and in CI
(``tests/test_oracle_dtypes.py``) before the driver sees it.

DuckDB side is probed via Arrow (``fetch_arrow_table().schema``) where a
HUGEINT is precisely visible as ``decimal128(38, 0)``.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

# Coarse classes. "hugeint" is deliberately its own class: Spark has no
# int128 output type, so it can never legally appear in an oracle schema.
_SPARK_CLASS = {
    T.ByteType: "int",
    T.ShortType: "int",
    T.IntegerType: "int",
    T.LongType: "int",
    T.FloatType: "float",
    T.DoubleType: "float",
    T.StringType: "str",
    T.BooleanType: "bool",
    T.DateType: "date",
    T.TimestampType: "timestamp",
    T.TimestampNTZType: "timestamp",
    T.BinaryType: "binary",
}


def spark_dtype_class(dt: T.DataType) -> str:
    for k, v in _SPARK_CLASS.items():
        if isinstance(dt, k):
            return v
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.ArrayType):
        return "array<%s>" % spark_dtype_class(dt.elementType)
    if isinstance(dt, (T.StructType, T.MapType)):
        return "nested"
    return "other:%s" % dt.simpleString()


def arrow_dtype_class(dt: pa.DataType) -> str:
    if pa.types.is_decimal(dt):
        # DuckDB HUGEINT → decimal128(38, 0); an intentional DECIMAL
        # column keeps its declared precision/scale (never 38,0 here).
        if dt.precision == 38 and dt.scale == 0:
            return "hugeint"
        return "decimal"
    if pa.types.is_integer(dt):
        return "int"
    if pa.types.is_floating(dt):
        return "float"
    if pa.types.is_string(dt) or pa.types.is_large_string(dt):
        return "str"
    if pa.types.is_boolean(dt):
        return "bool"
    if pa.types.is_date(dt):
        return "date"
    if pa.types.is_timestamp(dt):
        return "timestamp"
    if pa.types.is_binary(dt) or pa.types.is_large_binary(dt):
        return "binary"
    if pa.types.is_list(dt) or pa.types.is_large_list(dt):
        return "array<%s>" % arrow_dtype_class(dt.value_type)
    if pa.types.is_struct(dt) or pa.types.is_map(dt):
        return "nested"
    return "other:%s" % dt


def duck_oracle_schema(con, sql: str) -> pa.Schema:
    """Arrow schema of an oracle query without materializing its rows."""
    probe = "SELECT * FROM (%s) __dtype_probe LIMIT 0" % sql.rstrip().rstrip(";")
    return con.execute(probe).fetch_arrow_table().schema


def dtype_mismatches(spark_schema, arrow_schema) -> list:
    """[(col, spark_class, duck_class)] for every gate-punishable pairing.

    Column match is by lower-cased name (the gate sorts columns by name);
    columns present on only one side are a schema failure reported
    elsewhere, not here.
    """
    duck = {f.name.lower(): arrow_dtype_class(f.type) for f in arrow_schema}
    bad = []
    for field in spark_schema.fields:
        dc = duck.get(field.name.lower())
        if dc is None:
            continue
        sc = spark_dtype_class(field.dataType)
        if sc != dc:
            bad.append((field.name, sc, dc))
    return bad
