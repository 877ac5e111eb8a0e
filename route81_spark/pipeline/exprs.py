"""Mongo aggregation *expression* dialect -> pyspark Column.

Covers the operators reachable from route81 pipeline configs
(SURVEY §2.B expression table): used inside $project / $addFields /
$group accumulators / $expr. Everything compiles to built-in
pyspark.sql.functions (JVM-side, whole-stage-codegen'd) — no Python
UDFs in this module.

Dialect rules (MongoDB server semantics, mirrored because the reference
delegates execution to the server — /root/reference/route81.go:181-197):
  * a string starting with "$" is a field path ("$a.b" -> col("a.b"))
  * "$$ROOT" is the whole document (struct of all columns)
  * a dict with a single "$op" key is an operator application
  * a dict without "$" keys is a nested document constructor
  * lists compile element-wise to F.array unless the operator consumes
    them as an argument list
  * everything else is a literal
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class PipelineCompileError(ValueError):
    """Unsupported or malformed pipeline construct — fail loudly, mirroring
    route81's hard config validation (/root/reference/route81.go:273-277)."""


def _field(path: str, df: DataFrame | None = None) -> Column:
    if path == "$ROOT" or path == "ROOT":  # via $$ROOT
        if df is not None:
            return F.struct(*[F.col(c) for c in df.columns])
        return F.struct("*")
    return F.col(path)


def extjson_literal(d: dict) -> Column | None:
    """Recognize canonical-ext-JSON *literals* inside pipeline JSON —
    `{"$date": ...}`, `{"$numberLong": "5"}`, `{"$oid": "..."}` — the
    forms a Mongo-shell-authored config (README.md:271-313) carries.
    Returns None when `d` is not a literal form."""
    if len(d) != 1:
        return None
    k, v = next(iter(d.items()))
    if k == "$numberInt":
        return F.lit(int(v))
    if k == "$numberLong":
        return F.lit(int(v)).cast("long")
    if k == "$numberDouble":
        return F.lit(float(v))
    if k == "$numberDecimal":
        return F.lit(v).cast("decimal(38,10)")
    if k == "$oid":
        return F.lit(v)
    if k == "$date":
        if isinstance(v, dict) and "$numberLong" in v:
            return F.timestamp_micros(F.lit(int(v["$numberLong"]) * 1000))
        return F.lit(v).cast("timestamp")
    return None


def compile_expr(expr: Any, df: DataFrame | None = None) -> Column:
    """Compile one Mongo aggregation expression to a Column."""
    if isinstance(expr, str):
        if expr.startswith("$$"):
            name = expr[2:]
            if name == "ROOT":
                return _field("$ROOT", df)
            # $$this / $$value appear only inside higher-order lambdas,
            # which we compile with real Spark lambda variables below.
            raise PipelineCompileError(f"unsupported system variable: {expr}")
        if expr.startswith("$"):
            return F.col(expr[1:])
        return F.lit(expr)
    if isinstance(expr, bool) or isinstance(expr, (int, float)) or expr is None:
        return F.lit(expr)
    if isinstance(expr, list):
        return F.array(*[compile_expr(e, df) for e in expr])
    if isinstance(expr, dict):
        lit = extjson_literal(expr)
        if lit is not None:
            return lit
        op_keys = [k for k in expr if k.startswith("$")]
        if not op_keys:
            # document constructor
            return F.struct(*[compile_expr(v, df).alias(k) for k, v in expr.items()])
        if len(expr) != 1:
            raise PipelineCompileError(f"expression must have a single operator key: {expr}")
        op, arg = next(iter(expr.items()))
        return _compile_op(op, arg, df)
    raise PipelineCompileError(f"cannot compile expression: {expr!r}")


def _args(arg: Any, df: DataFrame | None, n: int | None = None) -> list[Column]:
    """Compile an operator argument list. Mongo allows a bare value where a
    one-element list is meant."""
    items = arg if isinstance(arg, list) else [arg]
    if n is not None and len(items) != n:
        raise PipelineCompileError(f"expected {n} args, got {len(items)}: {arg}")
    return [compile_expr(a, df) for a in items]


def _variadic(f: Callable[[Column, Column], Column]):
    def build(arg: Any, df: DataFrame | None) -> Column:
        cols = _args(arg, df)
        out = cols[0]
        for c in cols[1:]:
            out = f(out, c)
        return out

    return build


def _compile_cond(arg: Any, df: DataFrame | None) -> Column:
    if isinstance(arg, dict):
        branches = [arg.get("if"), arg.get("then"), arg.get("else")]
    else:
        branches = arg
    i, t, e = (compile_expr(x, df) for x in branches)
    return F.when(i, t).otherwise(e)


def _compile_switch(arg: Any, df: DataFrame | None) -> Column:
    out = None
    for b in arg["branches"]:
        case = compile_expr(b["case"], df)
        then = compile_expr(b["then"], df)
        out = F.when(case, then) if out is None else out.when(case, then)
    if "default" in arg:
        out = out.otherwise(compile_expr(arg["default"], df))
    return out


def _lambda_body(expr: Any, var: str, var_col: Column, df: DataFrame | None) -> Column:
    """Compile an expression that references $$<var> by substituting the
    Spark lambda variable. Handles the higher-order-function bodies of
    $filter/$map/$reduce."""

    def walk(e: Any) -> Any:
        if isinstance(e, str):
            if e == f"$${var}":
                return var_col
            if e.startswith(f"$${var}."):
                sub = e[len(var) + 3 :]
                c = var_col
                for part in sub.split("."):
                    c = c.getField(part)
                return c
            return compile_expr(e, df)
        if isinstance(e, list):
            return F.array(*[walk(x) for x in e])
        if isinstance(e, dict):
            op_keys = [k for k in e if k.startswith("$")]
            if not op_keys:
                return F.struct(*[walk(v).alias(k) for k, v in e.items()])
            op, arg = next(iter(e.items()))
            return _compile_op_cols(op, arg, walk, df)
        return compile_expr(e, df)

    return walk(expr)


def _reduce_body(expr: Any, value_col: Column, this_col: Column, df: DataFrame | None) -> Column:
    def walk(e: Any) -> Any:
        if isinstance(e, str):
            if e == "$$value":
                return value_col
            if e == "$$this":
                return this_col
            if e.startswith("$$value."):
                c = value_col
                for part in e[8:].split("."):
                    c = c.getField(part)
                return c
            if e.startswith("$$this."):
                c = this_col
                for part in e[7:].split("."):
                    c = c.getField(part)
                return c
            return compile_expr(e, df)
        if isinstance(e, list):
            return F.array(*[walk(x) for x in e])
        if isinstance(e, dict):
            op_keys = [k for k in e if k.startswith("$")]
            if not op_keys:
                return F.struct(*[walk(v).alias(k) for k, v in e.items()])
            op, arg = next(iter(e.items()))
            return _compile_op_cols(op, arg, walk, df)
        return compile_expr(e, df)

    return walk(expr)


def _compile_op_cols(op: str, arg: Any, walk: Callable[[Any], Column], df: DataFrame | None) -> Column:
    """Apply operator `op` where arguments are compiled via `walk`
    (used inside lambda bodies so $$this/$$value survive)."""
    items = arg if isinstance(arg, list) else [arg]
    cols = [walk(a) for a in items]
    return _apply_simple(op, cols, arg, df)


_DATE_FMT = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%L": "SSS",
    "%j": "DDD",
    "%%": "%",
}


def mongo_date_format(fmt: str) -> str:
    out = ""
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            out += _DATE_FMT.get(tok, tok)
            i += 2
        else:
            # literal chars that are letters must be quoted for SimpleDateFormat
            c = fmt[i]
            out += f"'{c}'" if c.isalpha() else c
            i += 1
    return out


def _apply_simple(op: str, cols: list[Column], raw_arg: Any, df: DataFrame | None) -> Column:
    """Operators whose compiled form is a pure function of already-compiled
    argument columns."""
    c = cols
    if op == "$add":
        out = c[0]
        for x in c[1:]:
            out = out + x
        return out
    if op == "$subtract":
        return c[0] - c[1]
    if op == "$multiply":
        out = c[0]
        for x in c[1:]:
            out = out * x
        return out
    if op == "$divide":
        return c[0] / c[1]
    if op == "$mod":
        return c[0] % c[1]
    if op == "$abs":
        return F.abs(c[0])
    if op == "$ceil":
        return F.ceil(c[0])
    if op == "$floor":
        return F.floor(c[0])
    if op == "$sqrt":
        return F.sqrt(c[0])
    if op == "$pow":
        return F.pow(c[0], c[1])
    if op == "$ln":
        return F.log(c[0])
    if op == "$log10":
        return F.log10(c[0])
    if op == "$exp":
        return F.exp(c[0])
    if op == "$round":
        return F.round(c[0], 0) if len(c) == 1 else F.round(c[0], raw_arg[1])
    if op == "$trunc":
        scale = 0 if len(c) == 1 else raw_arg[1]
        # Mongo truncates toward zero at the given decimal place.
        factor = float(10**scale)
        return F.when(c[0] >= 0, F.floor(c[0] * factor) / factor).otherwise(
            F.ceil(c[0] * factor) / factor
        )
    if op == "$concat":
        return F.concat(*c)
    if op == "$toUpper":
        return F.upper(c[0])
    if op == "$toLower":
        return F.lower(c[0])
    if op == "$strLenCP":
        return F.length(c[0])
    if op == "$substrCP" or op == "$substr":
        # Mongo is 0-based; Spark substring is 1-based.
        return F.substring(c[0], raw_arg[1] + 1, raw_arg[2])
    if op == "$split":
        # Mongo splits on a literal delimiter; Spark split() takes a regex.
        import re as _re

        delim = raw_arg[1] if isinstance(raw_arg, list) else None
        if isinstance(delim, str):
            return F.split(c[0], _re.escape(delim))
        return F.split(c[0], c[1])
    if op == "$trim":
        return F.trim(c[0])
    if op == "$ltrim":
        return F.ltrim(c[0])
    if op == "$rtrim":
        return F.rtrim(c[0])
    if op == "$toString":
        return c[0].cast("string")
    if op == "$toInt":
        return c[0].cast("int")
    if op == "$toLong":
        return c[0].cast("long")
    if op == "$toDouble":
        return c[0].cast("double")
    if op == "$toBool":
        return c[0].cast("boolean")
    if op == "$toDate":
        return c[0].cast("timestamp")
    if op == "$year":
        return F.year(c[0])
    if op == "$month":
        return F.month(c[0])
    if op == "$dayOfMonth":
        return F.dayofmonth(c[0])
    if op == "$hour":
        return F.hour(c[0])
    if op == "$minute":
        return F.minute(c[0])
    if op == "$second":
        return F.second(c[0])
    if op == "$dayOfWeek":
        return F.dayofweek(c[0])
    if op == "$dayOfYear":
        return F.dayofyear(c[0])
    if op == "$week":
        return F.weekofyear(c[0])
    if op == "$millisecond":
        return (F.unix_micros(c[0]) % 1_000_000 / 1000).cast("int")
    if op == "$eq":
        return c[0].eqNullSafe(c[1])
    if op == "$ne":
        return ~c[0].eqNullSafe(c[1])
    if op == "$gt":
        return c[0] > c[1]
    if op == "$gte":
        return c[0] >= c[1]
    if op == "$lt":
        return c[0] < c[1]
    if op == "$lte":
        return c[0] <= c[1]
    if op == "$cmp":
        return F.when(c[0] < c[1], -1).when(c[0] > c[1], 1).otherwise(0)
    if op == "$and":
        out = c[0]
        for x in c[1:]:
            out = out & x
        return out
    if op == "$or":
        out = c[0]
        for x in c[1:]:
            out = out | x
        return out
    if op == "$not":
        return ~F.coalesce(c[0], F.lit(False))
    if op == "$ifNull":
        return F.coalesce(*c)
    if op == "$arrayElemAt":
        # Mongo is 0-based, negative counts from the end, out-of-bounds
        # yields missing. F.get is the null-safe accessor (ANSI mode makes
        # element_at throw out-of-bounds).
        idx = c[1]
        return F.get(c[0], F.when(idx < 0, F.size(c[0]) + idx).otherwise(idx))
    if op == "$size":
        return F.size(c[0])
    if op == "$concatArrays":
        return F.concat(*c)
    if op == "$setUnion":
        out = c[0]
        for x in c[1:]:
            out = F.array_union(out, x)
        return F.array_sort(out)
    if op == "$setIntersection":
        out = c[0]
        for x in c[1:]:
            out = F.array_intersect(out, x)
        return F.array_sort(out)
    if op == "$setDifference":
        return F.array_sort(F.array_except(c[0], c[1]))
    if op == "$in":
        return F.array_contains(c[1], c[0])
    if op == "$slice":
        if len(raw_arg) == 2:
            n = raw_arg[1]
            if isinstance(n, int) and n < 0:
                return F.slice(c[0], F.greatest(F.size(c[0]) + n + 1, F.lit(1)), -n)
            return F.slice(c[0], 1, c[1])
        return F.slice(c[0], c[1] + F.lit(1), c[2])
    if op == "$range":
        step = c[2] if len(c) > 2 else F.lit(1)
        # Mongo $range excludes the end; Spark sequence includes it.
        return F.when(
            ((c[1] - c[0]) * step) > 0,
            F.sequence(c[0], c[1] - F.signum(step).cast("int"), step),
        ).otherwise(F.array().cast("array<int>"))
    if op == "$reverseArray":
        return F.reverse(c[0])
    if op == "$indexOfArray":
        # Mongo returns -1 when absent; array_position is 1-based, 0=absent
        return (F.array_position(c[0], c[1]) - 1).cast("int")
    if op == "$indexOfCP":
        if not (isinstance(raw_arg, list) and isinstance(raw_arg[1], str)):
            raise PipelineCompileError("$indexOfCP requires a literal search string")
        return (F.instr(c[0], raw_arg[1]) - 1).cast("int")
    if op == "$arrayToObject":
        raise PipelineCompileError("$arrayToObject requires map support; out of scope")
    if op == "$isArray":
        raise PipelineCompileError("$isArray requires schema introspection; not supported")
    if op == "$mergeObjects":
        raise PipelineCompileError("$mergeObjects outside $group is compiled per-stage")
    if op == "$literal":
        return F.lit(raw_arg)
    if op == "$type":
        raise PipelineCompileError("$type is schema-known; constant-fold at config time")
    if op == "$dateToString":
        raise PipelineCompileError("$dateToString handled in _compile_op")
    raise PipelineCompileError(f"unsupported expression operator: {op}")


def _compile_op(op: str, arg: Any, df: DataFrame | None) -> Column:
    # Operators with bespoke argument shapes first.
    if op == "$cond":
        return _compile_cond(arg, df)
    if op == "$switch":
        return _compile_switch(arg, df)
    if op == "$literal":
        return F.lit(arg)
    if op == "$dateToString":
        fmt = mongo_date_format(arg.get("format", "%Y-%m-%dT%H:%M:%S.%LZ"))
        return F.date_format(compile_expr(arg["date"], df), fmt)
    if op == "$regexMatch":
        inp = compile_expr(arg["input"], df)
        pattern = arg["regex"]
        if "i" in arg.get("options", ""):
            pattern = f"(?i){pattern}"
        return inp.rlike(pattern)
    if op == "$replaceAll":
        import re as _re

        inp = compile_expr(arg["input"], df)
        return F.regexp_replace(
            inp, _re.escape(arg["find"]), arg["replacement"].replace("$", r"\$")
        )
    if op == "$replaceOne":
        inp = compile_expr(arg["input"], df)
        find, repl = arg["find"], arg["replacement"]
        pos = F.instr(inp, find)
        return F.when(
            pos > 0,
            F.concat(
                F.substring(inp, 1, pos - 1).cast("string"),
                F.lit(repl),
                inp.substr(pos + len(find), F.length(inp)),
            ),
        ).otherwise(inp)
    if op == "$convert":
        inp = compile_expr(arg["input"], df)
        to = arg["to"]
        mapping = {
            "int": "int", "long": "long", "double": "double", "bool": "boolean",
            "string": "string", "date": "timestamp", "decimal": "decimal(38,10)",
        }
        if to not in mapping:
            raise PipelineCompileError(f"unsupported $convert target: {to}")
        out = inp.cast(mapping[to])
        if "onNull" in arg:
            out = F.coalesce(out, compile_expr(arg["onNull"], df))
        return out
    if op == "$dateAdd":
        start = compile_expr(arg["startDate"], df)
        unit = arg["unit"]
        if unit.lower() not in ("year", "quarter", "month", "week", "day", "hour", "minute", "second"):
            raise PipelineCompileError(f"unsupported $dateAdd unit: {unit}")
        amount = compile_expr(arg["amount"], df)
        return F.timestamp_add(unit.upper(), amount, start)
    if op == "$dateDiff":
        # Mongo counts *boundary crossings* (like DuckDB date_diff), not
        # elapsed full units (like Spark timestampdiff) — compile
        # accordingly per unit
        start = compile_expr(arg["startDate"], df)
        end = compile_expr(arg["endDate"], df)
        unit = arg["unit"]
        if unit == "day":
            return F.datediff(F.to_date(end), F.to_date(start)).cast("long")
        if unit == "year":
            return (F.year(end) - F.year(start)).cast("long")
        if unit == "month":
            return (
                (F.year(end) * 12 + F.month(end)) - (F.year(start) * 12 + F.month(start))
            ).cast("long")
        if unit == "hour":
            return (
                (F.unix_seconds(F.date_trunc("hour", end))
                 - F.unix_seconds(F.date_trunc("hour", start))) / 3600
            ).cast("long")
        raise PipelineCompileError(f"unsupported $dateDiff unit: {unit}")
    if op == "$filter":
        arr = compile_expr(arg["input"], df)
        var = arg.get("as", "this")
        return F.filter(arr, lambda x: _lambda_body(arg["cond"], var, x, df))
    if op == "$map":
        arr = compile_expr(arg["input"], df)
        var = arg.get("as", "this")
        return F.transform(arr, lambda x: _lambda_body(arg["in"], var, x, df))
    if op == "$reduce":
        arr = compile_expr(arg["input"], df)
        init = compile_expr(arg["initialValue"], df)
        return F.aggregate(arr, init, lambda acc, x: _reduce_body(arg["in"], acc, x, df))
    if op == "$zip":
        arrs = [compile_expr(a, df) for a in arg["inputs"]]
        if len(arrs) == 2:
            return F.zip_with(arrs[0], arrs[1], lambda a, b: F.array(a, b))
        raise PipelineCompileError("$zip supports exactly 2 inputs")
    if op == "$anyElementTrue":
        arr = _args(arg, df, 1)[0]
        return F.exists(arr, lambda x: F.coalesce(x.cast("boolean"), F.lit(False)))
    if op == "$allElementsTrue":
        arr = _args(arg, df, 1)[0]
        return F.forall(arr, lambda x: F.coalesce(x.cast("boolean"), F.lit(False)))
    if op == "$mergeObjects":
        raise PipelineCompileError("$mergeObjects supported only as a $group accumulator")
    if op in ("$trim", "$ltrim", "$rtrim") and isinstance(arg, dict):
        inp = compile_expr(arg["input"], df)
        if "chars" in arg:
            if op == "$trim":
                return F.btrim(inp, F.lit(arg["chars"]))
            # Spark has no char-set ltrim/rtrim Column function; fail
            # loudly rather than silently whitespace-trimming
            raise PipelineCompileError(f"{op} with chars is not supported")
        fn = {"$trim": F.trim, "$ltrim": F.ltrim, "$rtrim": F.rtrim}[op]
        return fn(inp)
    # everything else: compile args generically
    cols = _args(arg, df)
    return _apply_simple(op, cols, arg, df)
