"""Plain-JSON encoder parity (SURVEY §2 P9).

The reference's plain encoder (/root/reference/encoding/encoding.go:17-28,
65-134) is `json.Marshal` after a recursive pre-conversion:
  * time.Time -> millisecond ISO-8601 `2006-01-02T15:04:05.000Z07:00`;
    year < 0 or >= 10000 -> null (encoding.go:65-81)
  * float NaN -> "nan", +Inf -> "+inf", -Inf -> "-inf" (encoding.go:83-94)
  * recursion through maps and slices (encoding.go:96-134)

Here the same rules are schema-driven Column rewrites + one to_json.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def plain_json_col(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.TimestampNTZType):
        # NTZ wall time is treated as UTC (BSON datetimes are UTC
        # instants); date_format on NTZ is session-tz-independent
        return F.when(
            F.year(col).between(0, 9999),
            F.concat(F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSS"), F.lit("Z")),
        ).otherwise(F.lit(None).cast("string"))
    if isinstance(dtype, (T.TimestampType, T.DateType)):
        ts = col.cast("timestamp")
        return F.when(
            F.year(ts).between(0, 9999),
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"),
        ).otherwise(F.lit(None).cast("string"))
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        # finite floats stay JSON numbers; NaN/±Inf become the reference's
        # marker strings. JSON can mix types but a Column cannot, so the
        # non-finite rewrite happens textually in plain_json_string.
        return col
    if isinstance(dtype, T.ArrayType):
        return F.transform(col, lambda x: plain_json_col(x, dtype.elementType))
    if isinstance(dtype, T.StructType):
        return F.struct(
            *[plain_json_col(col.getField(f.name), f.dataType).alias(f.name) for f in dtype.fields]
        )
    return col


def _double_field_names(dtype: T.DataType) -> set[str]:
    """Names of struct fields whose type is floating — at any nesting
    depth — used to scope the non-finite rewrite to those keys only."""
    out: set[str] = set()
    if isinstance(dtype, T.StructType):
        for f in dtype.fields:
            if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
                out.add(f.name)
            else:
                out |= _double_field_names(f.dataType)
    elif isinstance(dtype, T.ArrayType):
        out |= _double_field_names(dtype.elementType)
    elif isinstance(dtype, T.MapType):
        out |= _double_field_names(dtype.valueType)
    return out


def _has_double_arrays(dtype: T.DataType) -> bool:
    if isinstance(dtype, T.ArrayType):
        return isinstance(dtype.elementType, (T.DoubleType, T.FloatType)) or _has_double_arrays(
            dtype.elementType
        )
    if isinstance(dtype, T.StructType):
        return any(_has_double_arrays(f.dataType) for f in dtype.fields)
    if isinstance(dtype, T.MapType):
        return _has_double_arrays(dtype.valueType)
    return False


def plain_json_string(col: Column, dtype: T.DataType) -> Column:
    import re as _re

    js = F.to_json(plain_json_col(col, dtype))
    # Spark's to_json emits non-finite doubles as the quoted strings
    # "NaN"/"Infinity"/"-Infinity" — textually identical to a *string*
    # field holding those values. Scope the marker rewrite
    # (encoding.go:83-94) by schema: only keys of floating-typed fields
    # are targeted, so string payloads keep their text.
    for name in sorted(_double_field_names(dtype)):
        q = _re.escape(name)
        js = F.regexp_replace(js, f'"{q}":"-Infinity"', f'"{name}":"-inf"')
        js = F.regexp_replace(js, f'"{q}":"Infinity"', f'"{name}":"+inf"')
        js = F.regexp_replace(js, f'"{q}":"NaN"', f'"{name}":"nan"')
    if _has_double_arrays(dtype):
        # elements of double arrays have no key to anchor on; rewrite
        # bare array-context tokens (residual: a *string array* holding
        # exactly "NaN" would also match — none exist in this engine's
        # schemas, and the reference has the same textual ambiguity)
        js = F.regexp_replace(js, r'(?<=[\[,])"-Infinity"(?=[,\]])', '"-inf"')
        js = F.regexp_replace(js, r'(?<=[\[,])"Infinity"(?=[,\]])', '"+inf"')
        js = F.regexp_replace(js, r'(?<=[\[,])"NaN"(?=[,\]])', '"nan"')
    return js
