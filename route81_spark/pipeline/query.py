"""Mongo *query-operator* dialect (the $match predicate language) -> Column.

This is the dialect of the one pipeline stage route81's README documents
(/root/reference/README.md:281-287, a $match on operationType); the
compilation contract is SURVEY §2's operator map.

Null/missing semantics (SURVEY §7 hard point 3): MongoDB equality on a
missing field matches documents where the field is null or absent, and
$ne / $nin / $not match documents where the field is missing. SQL
three-valued logic drops NULL comparisons instead. We compile
deliberately:

  {f: v}, v non-null   -> col(f) == v              (null rows excluded — same in Mongo: null != v)
  {f: null}            -> col(f).isNull()          (Mongo: matches null or missing)
  $ne v                -> NOT (col(f) <=> v)       (null rows MATCH, as in Mongo)
  $in [..null..]       -> isNull() | isin(rest)
  $in [..no null..]    -> isin(vs)                 (null -> NULL -> excluded; matches Mongo)
  $nin vs              -> NOT coalesce(isin, false) with the $in expansion
  $not pred            -> NOT coalesce(pred, false)
  $nor [p...]          -> NOT (coalesce(p1,false) | ...)
  $exists true/false   -> isNotNull / isNull       (fixed schema: missing == null)
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from route81_spark.pipeline.exprs import PipelineCompileError, compile_expr, extjson_literal


def _qlit(v: Any) -> Column:
    """Literal in query position: plain value or an ext-JSON literal
    form ({"$date": ...} etc., as Mongo-shell-authored configs carry)."""
    if isinstance(v, dict):
        lit = extjson_literal(v)
        if lit is not None:
            return lit
        raise PipelineCompileError(f"unsupported literal: {v}")
    return F.lit(v)


def _in_clause(col: Column, values: list[Any]) -> Column:
    non_null = [v for v in values if v is not None]
    clause = (
        col.isin([v for v in non_null if not isinstance(v, dict)])
        if non_null and not any(isinstance(v, dict) for v in non_null)
        else None
    )
    if clause is None and non_null:
        eqs = [col.eqNullSafe(_qlit(v)) for v in non_null]
        clause = eqs[0]
        for e in eqs[1:]:
            clause = clause | e
    if clause is None:
        clause = F.lit(False)
    if any(v is None for v in values):
        clause = col.isNull() | clause
    return clause


def _bit_mask(val: Any) -> int:
    """$bits* mask argument: a numeric bitmask or a list of bit positions."""
    if isinstance(val, int) and not isinstance(val, bool):
        return val
    if isinstance(val, list):
        return sum(1 << int(p) for p in val)
    raise PipelineCompileError(f"unsupported bitmask argument: {val!r}")


_TYPE_ALIASES: dict[str, tuple[str, ...]] = {
    # Mongo $type alias -> matching Spark simpleString prefixes
    "double": ("double", "float"),
    "string": ("string",),
    "int": ("int", "smallint", "tinyint"),
    "long": ("bigint",),
    "bool": ("boolean",),
    "date": ("timestamp", "timestamp_ntz", "date"),
    "array": ("array",),
    "object": ("struct", "map"),
    "binData": ("binary",),
    "decimal": ("decimal",),
}


def _type_pred(col: Column, field: str, val: Any, df: DataFrame | None) -> Column:
    """{f: {$type: alias}} constant-folds against the declared schema
    (SURVEY §2.B: '$type … schema-known: constant-fold'). A field of the
    matching type matches when present (non-null); 'null' matches null."""
    from route81_spark.pipeline.exprs import _field_dtype

    aliases = val if isinstance(val, list) else [val]
    dt = _field_dtype("$" + field, df)
    if dt is None:
        raise PipelineCompileError(f"$type needs a schema-known field: {field}")
    simple = dt.simpleString()
    out: Column | None = None
    for alias in aliases:
        if alias == "null":
            p = col.isNull()
        elif alias == "number":
            p = (
                col.isNotNull()
                if simple.startswith(("double", "float", "int", "bigint", "smallint", "tinyint", "decimal"))
                else F.lit(False)
            )
        elif alias in _TYPE_ALIASES:
            p = col.isNotNull() if simple.startswith(_TYPE_ALIASES[alias]) else F.lit(False)
        else:
            raise PipelineCompileError(f"unsupported $type alias: {alias}")
        out = p if out is None else (out | p)
    return out


def _geo_within(col: Column, shape: dict) -> Column:
    """$geoWithin over a legacy coordinate-pair field [lon, lat]
    ($box / $center planar, $centerSphere great-circle radians —
    the same spherical model as the $geoNear stage)."""
    lon, lat = F.get(col, 0).cast("double"), F.get(col, 1).cast("double")
    if "$box" in shape:
        (x1, y1), (x2, y2) = shape["$box"]
        return (
            (lon >= min(x1, x2)) & (lon <= max(x1, x2))
            & (lat >= min(y1, y2)) & (lat <= max(y1, y2))
        )
    if "$center" in shape:
        (cx, cy), r = shape["$center"]
        dx, dy = lon - cx, lat - cy
        return (dx * dx + dy * dy) <= float(r) ** 2
    if "$centerSphere" in shape:
        (cx, cy), r = shape["$centerSphere"]
        lat1, lon1 = F.radians(F.lit(float(cy))), F.radians(F.lit(float(cx)))
        lat2, lon2 = F.radians(lat), F.radians(lon)
        dlat, dlon = lat2 - lat1, lon2 - lon1
        a = (
            F.sin(dlat / 2) * F.sin(dlat / 2)
            + F.cos(lat1) * F.cos(lat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
        )
        central = 2 * F.asin(F.sqrt(a))  # angular distance in radians
        return central <= float(r)
    raise PipelineCompileError(f"unsupported $geoWithin shape: {list(shape)}")


def _field_pred(field: str, spec: Any, df: DataFrame | None) -> Column:
    col = F.col(field)
    if isinstance(spec, dict) and any(k.startswith("$") for k in spec):
        lit = extjson_literal(spec)
        if lit is not None:
            return col == lit  # equality against an ext-JSON literal
        preds: list[Column] = []
        for op, val in spec.items():
            if op == "$eq":
                preds.append(col.isNull() if val is None else col == _qlit(val))
            elif op == "$ne":
                preds.append(~col.eqNullSafe(_qlit(val)))
            elif op == "$gt":
                preds.append(col > _qlit(val))
            elif op == "$gte":
                preds.append(col >= _qlit(val))
            elif op == "$lt":
                preds.append(col < _qlit(val))
            elif op == "$lte":
                preds.append(col <= _qlit(val))
            elif op == "$in":
                preds.append(_in_clause(col, val))
            elif op == "$nin":
                preds.append(~F.coalesce(_in_clause(col, val), F.lit(False)))
            elif op == "$exists":
                preds.append(col.isNotNull() if val else col.isNull())
            elif op == "$regex":
                pattern = val
                opts = spec.get("$options", "")
                if "i" in opts:
                    pattern = f"(?i){pattern}"
                preds.append(col.rlike(pattern))
            elif op == "$options":
                continue  # consumed by $regex
            elif op == "$mod":
                d, r = val
                preds.append(col % F.lit(d) == F.lit(r))
            elif op == "$size":
                preds.append(F.size(col) == F.lit(val))
            elif op == "$all":
                sub = [F.array_contains(col, v) for v in val]
                p = sub[0]
                for s in sub[1:]:
                    p = p & s
                preds.append(p)
            elif op == "$elemMatch":
                preds.append(F.exists(col, lambda x: _elem_pred(x, val)))
            elif op == "$not":
                inner = _field_pred(field, val, df)
                preds.append(~F.coalesce(inner, F.lit(False)))
            elif op in ("$bitsAllSet", "$bitsAnySet", "$bitsAllClear", "$bitsAnyClear"):
                m = F.lit(_bit_mask(val))
                masked = col.cast("long").bitwiseAND(m)
                preds.append(
                    {
                        "$bitsAllSet": masked == m,
                        "$bitsAnySet": masked != 0,
                        "$bitsAllClear": masked == 0,
                        "$bitsAnyClear": masked != m,
                    }[op]
                )
            elif op == "$type":
                preds.append(_type_pred(col, field, val, df))
            elif op == "$geoWithin":
                preds.append(_geo_within(col, val))
            else:
                raise PipelineCompileError(f"unsupported query operator: {op}")
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out
    if isinstance(spec, re.Pattern):
        return col.rlike(spec.pattern)
    # bare equality
    if spec is None:
        return col.isNull()
    if isinstance(spec, dict):
        # equality against an embedded document -> struct literal compare
        return col.eqNullSafe(compile_expr(spec, df))
    return col == F.lit(spec)


def _elem_pred(x: Column, spec: Any) -> Column:
    """$elemMatch condition applied to an array element lambda variable."""
    if isinstance(spec, dict) and any(k.startswith("$") for k in spec):
        preds = []
        for op, val in spec.items():
            lit = F.lit(val)
            if op == "$eq":
                preds.append(x.eqNullSafe(lit))
            elif op == "$ne":
                preds.append(~x.eqNullSafe(lit))
            elif op == "$gt":
                preds.append(x > lit)
            elif op == "$gte":
                preds.append(x >= lit)
            elif op == "$lt":
                preds.append(x < lit)
            elif op == "$lte":
                preds.append(x <= lit)
            elif op == "$in":
                preds.append(_in_clause(x, val))
            else:
                raise PipelineCompileError(f"unsupported $elemMatch operator: {op}")
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out
    # equality on nested field specs: {field: value} against struct elements
    if isinstance(spec, dict):
        preds = [x.getField(k).eqNullSafe(F.lit(v)) for k, v in spec.items()]
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out
    return x.eqNullSafe(F.lit(spec))


def compile_match(query: dict, df: DataFrame | None = None) -> Column:
    """Compile a $match query document into one boolean Column."""
    preds: list[Column] = []
    for key, val in query.items():
        if key == "$and":
            sub = [compile_match(q, df) for q in val]
            p = sub[0]
            for s in sub[1:]:
                p = p & s
            preds.append(p)
        elif key == "$or":
            sub = [compile_match(q, df) for q in val]
            p = sub[0]
            for s in sub[1:]:
                p = p | s
            preds.append(p)
        elif key == "$nor":
            sub = [F.coalesce(compile_match(q, df), F.lit(False)) for q in val]
            p = sub[0]
            for s in sub[1:]:
                p = p | s
            preds.append(~p)
        elif key == "$expr":
            preds.append(F.coalesce(compile_expr(val, df).cast("boolean"), F.lit(False)))
        elif key == "$comment":
            continue  # server-side annotation; no predicate
        elif key == "$sampleRate":
            # random per-document inclusion; seeded for reproducibility
            # within a plan (no oracle — nondeterministic by contract)
            preds.append(F.rand(42) < float(val))
        elif key in ("$text", "$where", "$jsonSchema"):
            raise PipelineCompileError(
                f"{key} is out of scope (server-only feature; SURVEY §2.B)"
            )
        elif key.startswith("$"):
            raise PipelineCompileError(f"unsupported top-level query operator: {key}")
        else:
            preds.append(_field_pred(key, val, df))
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out
