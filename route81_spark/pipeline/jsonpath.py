"""Dynamic-document dialect (SURVEY §1.1-2 option b): run the $match
query dialect against documents carried as opaque JSON *strings* —
no declared schema required, matching the reference's schemaless model.

Fields resolve with get_json_object (JVM-side, codegen'd). Typing rule:
a predicate value's Python type picks the comparison domain (numbers
compare as double, strings as text, bools as boolean) — the pragmatic
equivalent of Mongo's type-bracketed comparisons for the JSON-scalar
subset. Supported: $eq $ne $gt $gte $lt $lte $in $nin $exists $regex
and bare equality, with the same missing-field null semantics as the
schema'd dialect."""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from route81_spark.pipeline.exprs import PipelineCompileError


def json_field(json_col: Column, path: str) -> Column:
    return F.get_json_object(json_col, f"$.{path}")


def _typed(raw: Column, exemplar: Any) -> Column:
    if isinstance(exemplar, bool):
        return raw.cast("boolean")
    if isinstance(exemplar, (int, float)):
        return raw.cast("double")
    return raw


def _field_pred(json_col: Column, field: str, spec: Any) -> Column:
    raw = json_field(json_col, field)
    if isinstance(spec, dict) and any(k.startswith("$") for k in spec):
        preds: list[Column] = []
        for op, val in spec.items():
            col = _typed(raw, val if not isinstance(val, list) else (val[0] if val else ""))
            lit = F.lit(float(val)) if isinstance(val, (int, float)) and not isinstance(val, bool) else F.lit(val)
            if op == "$eq":
                preds.append(raw.isNull() if val is None else col == lit)
            elif op == "$ne":
                preds.append(~col.eqNullSafe(lit))
            elif op == "$gt":
                preds.append(col > lit)
            elif op == "$gte":
                preds.append(col >= lit)
            elif op == "$lt":
                preds.append(col < lit)
            elif op == "$lte":
                preds.append(col <= lit)
            elif op == "$in":
                vals = [float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else v for v in val if v is not None]
                clause = col.isin(vals) if vals else F.lit(False)
                if any(v is None for v in val):
                    clause = raw.isNull() | clause
                preds.append(clause)
            elif op == "$nin":
                inner = _field_pred(json_col, field, {"$in": val})
                preds.append(~F.coalesce(inner, F.lit(False)))
            elif op == "$exists":
                preds.append(raw.isNotNull() if val else raw.isNull())
            elif op == "$regex":
                preds.append(raw.rlike(val))
            else:
                raise PipelineCompileError(f"unsupported dynamic query operator: {op}")
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out
    if spec is None:
        return raw.isNull()
    return _typed(raw, spec) == (
        F.lit(float(spec)) if isinstance(spec, (int, float)) and not isinstance(spec, bool) else F.lit(spec)
    )


def compile_match_json(query: dict, json_col: Column) -> Column:
    """$match over an opaque JSON document column."""
    preds: list[Column] = []
    for key, val in query.items():
        if key == "$and":
            sub = [compile_match_json(q, json_col) for q in val]
        elif key == "$or":
            sub = [compile_match_json(q, json_col) for q in val]
            out = sub[0]
            for s in sub[1:]:
                out = out | s
            preds.append(out)
            continue
        elif key == "$nor":
            out = F.coalesce(compile_match_json(val[0], json_col), F.lit(False))
            for q in val[1:]:
                out = out | F.coalesce(compile_match_json(q, json_col), F.lit(False))
            preds.append(~out)
            continue
        elif key.startswith("$"):
            raise PipelineCompileError(f"unsupported top-level operator: {key}")
        else:
            preds.append(_field_pred(json_col, key, val))
            continue
        p = sub[0]
        for s in sub[1:]:
            p = p & s
        preds.append(p)
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def project_json(json_col: Column, fields: dict[str, str]) -> list[Column]:
    """Inclusion projection over a JSON document: {out_name: path}."""
    return [json_field(json_col, path).alias(name) for name, path in fields.items()]
