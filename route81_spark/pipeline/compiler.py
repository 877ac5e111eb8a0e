"""Mongo aggregation pipeline *stages* -> DataFrame transform chain.

route81 parses pipelines as free-form JSON stage arrays
(/root/reference/route81.go:92-97, 268-282) and ships them to MongoDB;
here each stage becomes a declarative DataFrame operation so Catalyst
gets the whole plan (filter pushdown through $match, column pruning
through $project, partial aggregation through $group, ...).

Tier 1 (documented surface): $match $project $addFields $set $unset
$limit $count.  Tier 2 (standard core): $sort $skip $group $unwind
$replaceRoot/$replaceWith $sortByCount.  Extension stages (training-data
ops — SURVEY §7 M5) register via `register_stage`.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from route81_spark.pipeline.exprs import PipelineCompileError, compile_expr
from route81_spark.pipeline.query import compile_match

# Extension-stage registry: name -> fn(df, arg) -> df
EXTRA_STAGES: dict[str, Callable[[DataFrame, Any], DataFrame]] = {}


def register_stage(name: str, fn: Callable[[DataFrame, Any], DataFrame]) -> None:
    EXTRA_STAGES[name] = fn


# --- $group accumulators -------------------------------------------------

def _sort_key_col(sort_spec: dict | None, reverse: bool) -> Column | None:
    """Build the ordering column for sort-aware $first/$last. Supports a
    single sort key, or multiple keys sharing one direction (struct
    ordering is lexicographic)."""
    if not sort_spec:
        return None
    directions = set(sort_spec.values())
    if len(directions) != 1:
        return None  # mixed asc/desc not expressible via min_by/max_by
    cols = [F.col(k) for k in sort_spec]
    key = cols[0] if len(cols) == 1 else F.struct(*cols)
    return key


def _accumulator(spec: dict, df: DataFrame, sort_spec: dict | None = None) -> Column:
    if not (isinstance(spec, dict) and len(spec) == 1):
        raise PipelineCompileError(f"bad accumulator: {spec}")
    op, arg = next(iter(spec.items()))
    if op in ("$first", "$last") and sort_spec:
        # Mongo defines $first/$last by the pipeline's current document
        # order — after a $sort, that is min/max over the sort key.
        # Compile to min_by/max_by: deterministic under parallelism,
        # unlike Spark's order-dependent first()/last().
        key = _sort_key_col(sort_spec, reverse=False)
        if key is not None:
            direction = next(iter(sort_spec.values()))
            ascending = direction >= 0
            want_min = (op == "$first") == ascending
            fn = F.min_by if want_min else F.max_by
            return fn(compile_expr(arg, df), key)
    if op == "$sum":
        if isinstance(arg, (int, float)) and not isinstance(arg, bool):
            return F.count(F.lit(1)) * F.lit(arg) if arg != 1 else F.count(F.lit(1))
        # Mongo $sum ignores non-numeric/null and yields 0 for empty input.
        return F.coalesce(F.sum(compile_expr(arg, df)), F.lit(0))
    if op == "$avg":
        return F.avg(compile_expr(arg, df))
    if op == "$min":
        return F.min(compile_expr(arg, df))
    if op == "$max":
        return F.max(compile_expr(arg, df))
    if op == "$push":
        return F.collect_list(compile_expr(arg, df))
    if op == "$addToSet":
        # Mongo set order is undefined; sort for determinism.
        return F.array_sort(F.array_distinct(F.collect_list(compile_expr(arg, df))))
    if op == "$first":
        return F.first(compile_expr(arg, df))
    if op == "$last":
        return F.last(compile_expr(arg, df))
    if op == "$count":
        return F.count(F.lit(1))
    if op == "$stdDevPop":
        return F.stddev_pop(compile_expr(arg, df))
    if op == "$stdDevSamp":
        return F.stddev_samp(compile_expr(arg, df))
    raise PipelineCompileError(f"unsupported $group accumulator: {op}")


def _stage_group(df: DataFrame, arg: dict, sort_spec: dict | None = None) -> DataFrame:
    if "_id" not in arg:
        raise PipelineCompileError("$group requires _id")
    gid = arg["_id"]
    accs = [
        _accumulator(spec, df, sort_spec).alias(name)
        for name, spec in arg.items()
        if name != "_id"
    ]
    if gid is None:
        out = df.agg(*accs) if accs else df.agg(F.count(F.lit(1)).alias("__n")).drop("__n")
        return out.withColumn("_id", F.lit(None).cast("string")).select("_id", *[a for a in arg if a != "_id"])
    if isinstance(gid, dict) and not any(k.startswith("$") for k in gid):
        key = F.struct(*[compile_expr(v, df).alias(k) for k, v in gid.items()]).alias("_id")
    else:
        key = compile_expr(gid, df).alias("_id")
    return df.groupBy(key).agg(*accs)


# --- $project ------------------------------------------------------------

def _stage_project(df: DataFrame, arg: dict) -> DataFrame:
    if not arg:
        raise PipelineCompileError("$project requires at least one field")
    id_excluded = arg.get("_id") in (0, False)
    body = {k: v for k, v in arg.items() if k != "_id"}
    # {"_id": 0} alone is exclusion mode too (keep everything else)
    exclusion = (not body and id_excluded) or (
        bool(body) and all(v in (0, False) for v in body.values())
    )
    if exclusion:
        drops = list(body)
        if id_excluded:
            drops.append("_id")
        return df.drop(*[d for d in drops if d in df.columns or "." not in d])
    # inclusion / computed mode
    cols: list[Column] = []
    id_spec = arg.get("_id")
    if id_spec not in (None, 0, False, 1, True):
        cols.append(compile_expr(id_spec, df).alias("_id"))  # computed _id
    elif "_id" in df.columns and not id_excluded:
        cols.append(F.col("_id"))
    nested: dict[str, dict] = {}
    for name, spec in body.items():
        if spec in (0, False):
            raise PipelineCompileError("cannot mix exclusion with inclusion in $project")
        if "." in name:
            top, rest = name.split(".", 1)
            nested.setdefault(top, {})[rest] = spec
            continue
        if spec in (1, True):
            cols.append(F.col(name))
        else:
            cols.append(compile_expr(spec, df).alias(name))
    for top, subs in nested.items():
        fields = []
        for rest, spec in subs.items():
            if "." in rest:
                raise PipelineCompileError("max 2-level dotted paths in $project")
            if spec in (1, True):
                fields.append(F.col(f"{top}.{rest}").alias(rest))
            else:
                fields.append(compile_expr(spec, df).alias(rest))
        cols.append(F.struct(*fields).alias(top))
    return df.select(*cols)


def _stage_add_fields(df: DataFrame, arg: dict) -> DataFrame:
    out = df
    for name, spec in arg.items():
        if "." in name:
            top, rest = name.split(".", 1)
            if "." in rest:
                raise PipelineCompileError("max 2-level dotted paths in $addFields")
            out = out.withColumn(top, F.col(top).withField(rest, compile_expr(spec, out)))
        else:
            out = out.withColumn(name, compile_expr(spec, out))
    return out


def _stage_unwind(df: DataFrame, arg: Any) -> DataFrame:
    if isinstance(arg, str):
        path, include_idx, preserve = arg, None, False
    else:
        path = arg["path"]
        include_idx = arg.get("includeArrayIndex")
        preserve = bool(arg.get("preserveNullAndEmptyArrays", False))
    if not path.startswith("$"):
        raise PipelineCompileError("$unwind path must start with $")
    field = path[1:]
    others = [c for c in df.columns if c != field]
    if include_idx:
        gen = F.posexplode_outer(F.col(field)) if preserve else F.posexplode(F.col(field))
        out = df.select(*others, gen.alias(include_idx, field))
        # Mongo puts the index as a long; posexplode yields int pos
        return out.withColumn(include_idx, F.col(include_idx).cast("long"))
    gen = F.explode_outer(F.col(field)) if preserve else F.explode(F.col(field))
    return df.select(*others, gen.alias(field))


def _stage_replace_root(df: DataFrame, arg: Any) -> DataFrame:
    new_root = arg["newRoot"] if isinstance(arg, dict) and "newRoot" in arg else arg
    col = compile_expr(new_root, df)
    return df.select(col.alias("__root")).select("__root.*")


def _stage_sort(df: DataFrame, arg: dict) -> DataFrame:
    orders = []
    for field, direction in arg.items():
        c = F.col(field)
        # Mongo sorts missing/null lowest: nulls first asc, nulls last desc.
        orders.append(c.asc_nulls_first() if direction >= 0 else c.desc_nulls_last())
    return df.orderBy(*orders)


_KNOWN_STAGES = {
    "$match", "$project", "$addFields", "$set", "$unset", "$limit", "$skip",
    "$count", "$sort", "$group", "$unwind", "$replaceRoot", "$replaceWith",
    "$sortByCount", "$sample",
}


def compile_stage(stage: dict, sort_spec: dict | None = None) -> Callable[[DataFrame], DataFrame]:
    if not (isinstance(stage, dict) and len(stage) == 1):
        raise PipelineCompileError(f"each pipeline stage must be a single-key document: {stage}")
    name, arg = next(iter(stage.items()))
    if name not in _KNOWN_STAGES and name not in EXTRA_STAGES:
        # extension stages register on route81_spark.ops import; load it
        # before declaring the stage unknown so pipeline JSON works from
        # any entry point (e.g. python -m route81_spark.main)
        import route81_spark.ops  # noqa: F401

        if name not in EXTRA_STAGES:
            # fail at config time, mirroring route81's hard pipeline-JSON
            # validation (route81.go:273-277); $redact/$lookup/$facet/
            # $bucket are documented out of scope (SURVEY §2.B)
            raise PipelineCompileError(f"unsupported pipeline stage: {name}")

    def fn(df: DataFrame) -> DataFrame:
        if name == "$match":
            return df.filter(compile_match(arg, df))
        if name == "$project":
            return _stage_project(df, arg)
        if name in ("$addFields", "$set"):
            return _stage_add_fields(df, arg)
        if name == "$unset":
            fields = arg if isinstance(arg, list) else [arg]
            return df.drop(*fields)
        if name == "$limit":
            return df.limit(int(arg))
        if name == "$skip":
            return df.offset(int(arg))
        if name == "$count":
            return df.agg(F.count(F.lit(1)).alias(arg))
        if name == "$sort":
            return _stage_sort(df, arg)
        if name == "$group":
            return _stage_group(df, arg, sort_spec)
        if name == "$unwind":
            return _stage_unwind(df, arg)
        if name in ("$replaceRoot", "$replaceWith"):
            return _stage_replace_root(df, arg if name == "$replaceRoot" else {"newRoot": arg})
        if name == "$sample":
            # Mongo $sample is random; with the `key` extension the
            # sample is a deterministic md5-ordering — reproducible
            # sampling, which training-data pipelines want anyway
            n = int(arg["size"])
            if "key" in arg:
                h = F.md5(F.concat(F.lit("s|"), compile_expr(arg["key"], df).cast("string")))
                return df.orderBy(h).limit(n)
            return df.orderBy(F.rand()).limit(n)
        if name == "$sortByCount":
            g = df.groupBy(compile_expr(arg, df).alias("_id")).agg(F.count(F.lit(1)).alias("count"))
            return g.orderBy(F.col("count").desc(), F.col("_id").asc_nulls_first())
        if name in EXTRA_STAGES:
            return EXTRA_STAGES[name](df, arg)
        raise PipelineCompileError(f"unsupported pipeline stage: {name}")

    return fn


def compile_pipeline(stages: list[dict]) -> Callable[[DataFrame], DataFrame]:
    """Compile a stage list into one DataFrame -> DataFrame transform.
    Tracks the most recent $sort so $first/$last accumulators in a later
    $group compile to deterministic min_by/max_by over the sort key."""
    fns = []
    sort_spec: dict | None = None
    for s in stages:
        fns.append(compile_stage(s, sort_spec))
        key = next(iter(s))
        if key == "$sort":
            sort_spec = s["$sort"]
        elif key == "$group":
            sort_spec = None  # grouping discards document order

    def run(df: DataFrame) -> DataFrame:
        for f in fns:
            df = f(df)
        return df

    return run


def apply_pipeline(df: DataFrame, stages: list[dict]) -> DataFrame:
    return compile_pipeline(stages)(df)
