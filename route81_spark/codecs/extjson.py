"""Canonical MongoDB Extended JSON encoding as Column expressions.

The reference encodes every produced Kafka value with
`bson.MarshalExtJSON(val, canonical=true, escapeHTML=true)`
(/root/reference/encoding/encoding.go:30-38). Canonical ext-JSON tags
every BSON type (`{"$numberInt": "1"}`, `{"$date": {"$numberLong":
"…"}}`, README goldens at /root/reference/README.md:113-182).

Spark-first design: because the harness path has a *declared* schema
(SURVEY §1.1 option a), the tagging is a deterministic schema-driven
struct rebuild — `int` column -> `struct<$numberInt: string>` — then a
single `to_json`. No Python in the hot path; `to_json` drops null
fields (spark.sql.jsonGenerator.ignoreNullFields default), which is
what makes optional envelope keys (op/data/updates) drop out exactly
like Go's `omitempty`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _tag(name: str, value: Column) -> Column:
    return F.struct(value.alias(name))


def ext_json_col(col: Column, dtype: T.DataType, oid: bool = False) -> Column:
    """Rebuild `col` of type `dtype` as its canonical-ext-JSON-shaped
    struct. `oid=True` marks a 24-hex string column as an ObjectId."""
    if isinstance(dtype, T.StringType):
        return _tag("$oid", col) if oid else col
    if isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
        return _tag("$numberInt", col.cast("string"))
    if isinstance(dtype, T.LongType):
        return _tag("$numberLong", col.cast("string"))
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        # canonical doubles render as decimal strings; NaN/Inf use words
        return _tag(
            "$numberDouble",
            F.when(F.isnan(col), F.lit("NaN"))
            .when(col == F.lit(float("inf")), F.lit("Infinity"))
            .when(col == F.lit(float("-inf")), F.lit("-Infinity"))
            .otherwise(col.cast("string")),
        )
    if isinstance(dtype, T.DecimalType):
        return _tag("$numberDecimal", col.cast("string"))
    if isinstance(dtype, T.BooleanType):
        return col
    if isinstance(dtype, T.TimestampNTZType):
        # raw parquet reads surface TIMESTAMP_NTZ; BSON datetimes are
        # UTC instants, so interpret the wall time AS UTC via pure
        # wall-clock arithmetic — unix_micros/to_utc_timestamp both
        # coerce NTZ through the session timezone and would shift the
        # epoch on non-UTC drivers
        us = F.timestamp_diff(
            "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), col
        )
        # floor division like Go's UnixMilli — (us/1000).cast('long')
        # truncates toward zero, putting pre-1970 sub-ms times 1ms high.
        # Subtracting the (non-negative) pmod makes us an exact multiple
        # of 1000, so the double division is exact for |us| < 2^53
        ms = ((us - F.pmod(us, F.lit(1000))) / 1000).cast("long").cast("string")
        return _tag("$date", _tag("$numberLong", ms))
    if isinstance(dtype, (T.TimestampType, T.DateType)):
        ms = (F.unix_micros(col.cast("timestamp")) / 1000).cast("long").cast("string")
        return _tag("$date", _tag("$numberLong", ms))
    if isinstance(dtype, T.BinaryType):
        return F.struct(
            F.struct(
                F.base64(col).alias("base64"),
                F.lit("00").alias("subType"),
            ).alias("$binary")
        )
    if isinstance(dtype, T.ArrayType):
        return F.transform(col, lambda x: ext_json_col(x, dtype.elementType))
    if isinstance(dtype, T.StructType):
        # preserve nullness: a null document must encode as absent/null,
        # not as an object of nulls
        return F.when(
            col.isNotNull(),
            F.struct(
                *[
                    ext_json_col(
                        col.getField(f.name), f.dataType, oid=(f.name == "_id" and oid)
                    ).alias(f.name)
                    for f in dtype.fields
                ]
            ),
        )
    if isinstance(dtype, T.MapType):
        # keep string-keyed maps as-is when values are strings; else recurse values
        return F.map_from_arrays(
            F.map_keys(col),
            F.transform(F.map_values(col), lambda v: ext_json_col(v, dtype.valueType)),
        )
    return col


def ext_json_string(col: Column, dtype: T.DataType, oid: bool = False) -> Column:
    """Canonical ext-JSON text of a column (to_json of the tagged rebuild)."""
    return F.to_json(ext_json_col(col, dtype, oid=oid))


# --- decode: tagged wire schema + tag stripping --------------------------

def ext_json_tagged_schema(dtype: T.DataType, oid: bool = False) -> T.DataType:
    """The wire-side (tagged) schema for a plain schema — the shape
    from_json needs to parse canonical ext-JSON of `dtype`."""
    if isinstance(dtype, T.StringType):
        if oid:
            return T.StructType([T.StructField("$oid", T.StringType())])
        return dtype
    if isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
        return T.StructType([T.StructField("$numberInt", T.StringType())])
    if isinstance(dtype, T.LongType):
        return T.StructType([T.StructField("$numberLong", T.StringType())])
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return T.StructType([T.StructField("$numberDouble", T.StringType())])
    if isinstance(dtype, T.BooleanType):
        return dtype
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return T.StructType(
            [
                T.StructField(
                    "$date",
                    T.StructType([T.StructField("$numberLong", T.StringType())]),
                )
            ]
        )
    if isinstance(dtype, T.BinaryType):
        return T.StructType(
            [
                T.StructField(
                    "$binary",
                    T.StructType(
                        [
                            T.StructField("base64", T.StringType()),
                            T.StructField("subType", T.StringType()),
                        ]
                    ),
                )
            ]
        )
    if isinstance(dtype, T.ArrayType):
        return T.ArrayType(ext_json_tagged_schema(dtype.elementType))
    if isinstance(dtype, T.MapType):
        return T.MapType(dtype.keyType, ext_json_tagged_schema(dtype.valueType))
    if isinstance(dtype, T.StructType):
        return T.StructType(
            [
                T.StructField(
                    f.name,
                    ext_json_tagged_schema(f.dataType, oid=(f.name == "_id" and oid)),
                )
                for f in dtype.fields
            ]
        )
    return dtype


def strip_ext_json(col: Column, dtype: T.DataType, oid: bool = False) -> Column:
    """Rebuild the plain typed value from a tagged (wire-schema) column."""
    if isinstance(dtype, T.StringType):
        return col.getField("$oid") if oid else col
    if isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
        return col.getField("$numberInt").cast(dtype)
    if isinstance(dtype, T.LongType):
        return col.getField("$numberLong").cast("long")
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return col.getField("$numberDouble").cast(dtype)
    if isinstance(dtype, T.BooleanType):
        return col
    if isinstance(dtype, T.TimestampNTZType):
        # inverse of the encode path: UTC epoch ms -> NTZ wall time,
        # session-timezone-independent (timestampadd on NTZ is pure
        # wall-clock arithmetic)
        ms = col.getField("$date").getField("$numberLong").cast("long")
        return F.timestamp_add(
            "MICROSECOND", ms * 1000, F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        )
    if isinstance(dtype, (T.TimestampType, T.DateType)):
        ms = col.getField("$date").getField("$numberLong").cast("long")
        ts = F.timestamp_micros(ms * 1000)
        return ts.cast(dtype) if isinstance(dtype, T.DateType) else ts
    if isinstance(dtype, T.BinaryType):
        return F.unbase64(col.getField("$binary").getField("base64"))
    if isinstance(dtype, T.ArrayType):
        return F.transform(col, lambda x: strip_ext_json(x, dtype.elementType))
    if isinstance(dtype, T.MapType):
        return F.map_from_arrays(
            F.map_keys(col),
            F.transform(F.map_values(col), lambda v: strip_ext_json(v, dtype.valueType)),
        )
    if isinstance(dtype, T.StructType):
        return F.when(
            col.isNotNull(),
            F.struct(
                *[
                    strip_ext_json(
                        col.getField(f.name), f.dataType, oid=(f.name == "_id" and oid)
                    ).alias(f.name)
                    for f in dtype.fields
                ]
            ),
        )
    return col


def decode_ext_json(value_col: Column, dtype: T.DataType, oid: bool = False) -> Column:
    """bytes/string of canonical ext-JSON -> typed struct column.
    The inverse of ext_json_string for declared schemas (P11)."""
    tagged = ext_json_tagged_schema(dtype, oid=oid)
    parsed = F.from_json(value_col.cast("string"), tagged)
    return strip_ext_json(parsed, dtype, oid=oid)
