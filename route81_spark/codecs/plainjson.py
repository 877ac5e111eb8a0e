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


def plain_json_string(col: Column, dtype: T.DataType) -> Column:
    js = F.to_json(plain_json_col(col, dtype))
    # Spark's to_json emits non-finite doubles as the quoted strings
    # "NaN" / "Infinity" / "-Infinity"; rewrite them to the reference's
    # marker strings (encoding.go:83-94). The leading [:,\[] boundary
    # keeps user string payloads containing e.g. `"NaN"` untouched
    # (those appear after a quote, not directly after : , or [).
    js = F.regexp_replace(js, r'(?<=[:,\[])"-Infinity"', '"-inf"')
    js = F.regexp_replace(js, r'(?<=[:,\[])"Infinity"', '"+inf"')
    js = F.regexp_replace(js, r'(?<=[:,\[])"NaN"', '"nan"')
    return js
