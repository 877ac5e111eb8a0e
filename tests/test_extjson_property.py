"""Property-based ext-JSON codec round-trip (SURVEY §5-4): encode ∘
decode = identity over generated documents covering the §1.2 type
matrix (ints, longs, doubles, strings, booleans, timestamps, binary,
arrays, nested structs, nulls)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from route81_spark.codecs.extjson import decode_ext_json, ext_json_string

SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("i32", T.IntegerType()),
        T.StructField("i64", T.LongType()),
        T.StructField("dbl", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("bin", T.BinaryType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
        T.StructField(
            "nested",
            T.StructType(
                [T.StructField("x", T.IntegerType()), T.StructField("tags", T.ArrayType(T.StringType()))]
            ),
        ),
    ]
)

_docs = st.fixed_dictionaries(
    {
        "_id": st.text(min_size=1, max_size=12),
        "i32": st.none() | st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "i64": st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "dbl": st.none()
        | st.floats(allow_nan=False, allow_infinity=False, width=64).filter(
            # doubles whose Spark string form is plain decimal (no
            # scientific notation) round-trip textually; scientific forms
            # also round-trip but make equality comparison awkward
            lambda x: x == 0 or 1e-3 < abs(x) < 1e7
        ),
        "s": st.none() | st.text(max_size=20),
        "b": st.none() | st.booleans(),
        "ts": st.none()
        | st.datetimes(
            min_value=dt.datetime(1900, 1, 1),
            max_value=dt.datetime(2200, 1, 1),
        ).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000)),
        "bin": st.none() | st.binary(max_size=16),
        "arr": st.none() | st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=4),
        "nested": st.none()
        | st.fixed_dictionaries(
            {"x": st.integers(min_value=-100, max_value=100), "tags": st.lists(st.text(max_size=5), max_size=3)}
        ),
    }
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(doc=_docs)
def test_ext_json_round_trip(spark, doc):
    row = dict(doc)
    if row["nested"] is not None:
        row["nested"] = Row(**row["nested"])
    df = spark.createDataFrame([Row(**row)], SCHEMA)
    encoded = df.select(
        ext_json_string(F.struct(*[F.col(c) for c in df.columns]), SCHEMA).alias("j")
    )
    decoded = encoded.select(decode_ext_json(F.col("j"), SCHEMA).alias("d")).select("d.*")
    got = decoded.collect()[0].asDict(recursive=True)
    want = df.collect()[0].asDict(recursive=True)
    # ext-JSON dates are epoch-millis: sub-ms precision is clamped by
    # construction in the strategy, so equality is exact
    assert got == want
