"""Avro binary codec (SURVEY §2 P10/P11).

The reference uses goavro with a per-consumer `avro-schema-spec`
(/root/reference/encoding/encoding.go:40-63; README.md:349-368). This
container has neither spark-avro nor fastavro, so this is a minimal,
dependency-free implementation of the Avro binary spec for record
schemas (null/boolean/int/long/float/double/bytes/string, nullable
unions, arrays, maps, nested records) — enough for every shape the
reference's docs demonstrate. In production, swap the pandas codec for
`from_avro`/`to_avro` (spark-avro) — the DataFrame-level API here is
already the right shape for that substitution.

Spark integration is Arrow-batched (mapInPandas): bytes in, decoded
columns out — the per-record Python cost is the same class of work
goavro does per record in Go.
"""

from __future__ import annotations

import io
import json
import struct
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# --- binary primitives ---------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    n = _zigzag_encode(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc)
        shift += 7


# --- schema-driven encode/decode ----------------------------------------


def _encode(out: io.BytesIO, schema: Any, value: Any) -> None:
    if isinstance(schema, list):  # union
        for idx, branch in enumerate(schema):
            if _matches(branch, value):
                _write_long(out, idx)
                _encode(out, branch, value)
                return
        raise ValueError(f"value {value!r} matches no union branch {schema}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_long(out, len(value))
        out.write(bytes(value))
    elif t == "string":
        raw = value.encode("utf-8")
        _write_long(out, len(raw))
        out.write(raw)
    elif t == "record":
        for f in schema["fields"]:
            _encode(out, f["type"], value.get(f["name"]))
    elif t == "array":
        items = list(value)
        if items:
            _write_long(out, len(items))
            for it in items:
                _encode(out, schema["items"], it)
        _write_long(out, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            _write_long(out, len(entries))
            for k, v in entries.items():
                _encode(out, "string", k)
                _encode(out, schema["values"], v)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported avro type: {t}")


def _matches(branch: Any, value: Any) -> bool:
    t = branch["type"] if isinstance(branch, dict) else branch
    if t == "null":
        return value is None
    return value is not None


def _decode(buf: io.BytesIO, schema: Any) -> Any:
    if isinstance(schema, list):
        idx = _read_long(buf)
        return _decode(buf, schema[idx])
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return buf.read(_read_long(buf))
    if t == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if t == "record":
        return {f["name"]: _decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_decode(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _decode(buf, "string")
                out[k] = _decode(buf, schema["values"])
    raise ValueError(f"unsupported avro type: {t}")


def avro_encode(schema: dict | str, value: dict) -> bytes:
    if isinstance(schema, str):
        schema = json.loads(schema)
    out = io.BytesIO()
    _encode(out, schema, value)
    return out.getvalue()


def avro_decode(schema: dict | str, payload: bytes) -> dict:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return _decode(io.BytesIO(payload), schema)


# --- textual (Avro JSON) encoding ----------------------------------------
# goavro's TextualFromNative / NativeFromTextual equivalent
# (encoding/encoding.go:50-57): unions wrap non-null values as
# {"<type>": value}; bytes map through ISO-8859-1.


def _branch_name(branch: Any) -> str:
    t = branch["type"] if isinstance(branch, dict) else branch
    if t in ("record", "array", "map"):
        return branch.get("name", t) if t == "record" else t
    return t


def _to_textual(schema: Any, value: Any) -> Any:
    if isinstance(schema, list):
        for branch in schema:
            if _matches(branch, value):
                t = _branch_name(branch)
                if t == "null":
                    return None
                return {t: _to_textual(branch, value)}
        raise ValueError(f"value {value!r} matches no union branch")
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "bytes":
        return bytes(value).decode("iso-8859-1")
    if t == "record":
        return {f["name"]: _to_textual(f["type"], value.get(f["name"])) for f in schema["fields"]}
    if t == "array":
        return [_to_textual(schema["items"], v) for v in value]
    if t == "map":
        return {k: _to_textual(schema["values"], v) for k, v in value.items()}
    return value


def _from_textual(schema: Any, value: Any) -> Any:
    if isinstance(schema, list):
        if value is None:
            return None
        (tname, inner), = value.items()
        for branch in schema:
            if _branch_name(branch) == tname:
                return _from_textual(branch, inner)
        raise ValueError(f"unknown union branch {tname}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "bytes":
        return value.encode("iso-8859-1")
    if t == "record":
        return {f["name"]: _from_textual(f["type"], value.get(f["name"])) for f in schema["fields"]}
    if t == "array":
        return [_from_textual(schema["items"], v) for v in value]
    if t == "map":
        return {k: _from_textual(schema["values"], v) for k, v in value.items()}
    return value


def avro_encode_textual(schema: dict | str, value: dict) -> bytes:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return json.dumps(_to_textual(schema, value), separators=(",", ":")).encode()


def avro_decode_textual(schema: dict | str, payload: bytes) -> dict:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return _from_textual(schema, json.loads(payload.decode()))


# --- Spark integration ---------------------------------------------------


def _avro_to_spark_type(schema: Any) -> T.DataType:
    if isinstance(schema, list):
        non_null = [b for b in schema if (b["type"] if isinstance(b, dict) else b) != "null"]
        return _avro_to_spark_type(non_null[0])
    t = schema["type"] if isinstance(schema, dict) else schema
    mapping = {
        "boolean": T.BooleanType(), "int": T.IntegerType(), "long": T.LongType(),
        "float": T.FloatType(), "double": T.DoubleType(), "bytes": T.BinaryType(),
        "string": T.StringType(),
    }
    if t in mapping:
        return mapping[t]
    if t == "record":
        return T.StructType(
            [T.StructField(f["name"], _avro_to_spark_type(f["type"])) for f in schema["fields"]]
        )
    if t == "array":
        return T.ArrayType(_avro_to_spark_type(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(), _avro_to_spark_type(schema["values"]))
    raise ValueError(f"unsupported avro type: {t}")


def decode_avro_records(
    records: DataFrame, schema_spec: str, binary: bool = True
) -> DataFrame:
    """Kafka records with avro `value` bytes -> decoded document rows
    (one column per top-level record field, plus passthrough `seq`).

    `binary` selects the wire form like the reference's AvroMessageDecoder
    (decoding/decoding.go:45-57): NativeFromBinary vs NativeFromTextual."""
    schema = json.loads(schema_spec)
    decode_one = avro_decode if binary else avro_decode_textual
    spark_type = _avro_to_spark_type(schema)
    if not isinstance(spark_type, T.StructType):
        raise ValueError("avro-schema-spec must be a record schema")
    has_seq = "seq" in records.columns
    fields = list(spark_type.fields)
    out_schema = T.StructType(fields + ([T.StructField("seq", T.LongType())] if has_seq else []))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_one(schema, bytes(v)) for v in pdf["value"]]
            frame = pd.DataFrame(rows, columns=[f.name for f in fields])
            if has_seq:
                frame["seq"] = pdf["seq"].values
            yield frame

    return records.mapInPandas(run, schema=out_schema)


def encode_avro_records(
    df: DataFrame, schema_spec: str, binary: bool = True
) -> DataFrame:
    """Document rows -> avro `value` bytes (the inverse of
    decode_avro_records; Arrow-batched like it). The reference only
    DECODES avro (consumer side, decoding/decoding.go:45-57) — this
    encoder exists so the codec is closed under roundtrip and testable
    end-to-end without external fixtures."""
    schema = json.loads(schema_spec)
    encode_one = avro_encode if binary else avro_encode_textual
    spark_type = _avro_to_spark_type(schema)
    if not isinstance(spark_type, T.StructType):
        raise ValueError("avro-schema-spec must be a record schema")
    names = [f["name"] for f in schema["fields"]]
    missing = [n for n in names if n not in df.columns]
    if missing:
        raise ValueError(f"dataframe lacks avro record fields: {missing}")

    def _clean(v):
        # pandas surfaces SQL NULLs as NaN/None; avro unions want None
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        return v

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = [
                encode_one(schema, {n: _clean(row[n]) for n in names})
                for row in pdf.to_dict("records")
            ]
            yield pd.DataFrame({"value": vals})

    return df.select(*names).mapInPandas(run, schema="value binary")
