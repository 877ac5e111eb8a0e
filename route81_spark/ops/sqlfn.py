"""Once-per-session SQL temp-function registration for big pure-Column
scalar programs.

Building a large Column program (the Snowball stemmers: ~13-30 KB
expression trees) costs seconds of DRIVER time per application —
thousands of Py4J round trips constructing the tree (measured on the
English stemmer: Catalyst analysis is <30 ms; the cost is tree
CONSTRUCTION, not planning). The fix: build the tree ONCE per process,
extract its SQL text from an (unanalyzed) logical plan, and register a
SQL temporary function over a whole token ARRAY —

    CREATE TEMPORARY FUNCTION <name>(toks ARRAY<STRING>)
    RETURNS ARRAY<STRING> RETURN transform(toks, tok -> <body>)

after which every application is one `call_function` (a single Py4J
call; the body is inlined JVM-side at analysis). The function takes
the ARRAY deliberately: SQL-UDF inlining does not compose with an
argument that is an outer lambda variable (MISSING_ATTRIBUTES), so the
per-token lambda must live INSIDE the registered body, and call sites
must never wrap the function in their own transform().

Single source of truth: the registered body IS the Column program's
tree (extracted, never re-written by hand); `lambdafunction(body, v)`
is the one .sql() form that does not re-parse, rewritten to arrow form
by lambda_arrows below. Callers fall back to the inline Column program
when there is no active session or registration fails.
"""

from __future__ import annotations

import warnings
import weakref
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

_SQL_BODIES: dict[str, str] = {}  # fn name -> body text (deterministic)
# session -> {fn name: registration succeeded}. Keyed by the LIVE
# session object (weak — entries die with the session), never by
# id(): CPython reuses addresses after GC, and a reused id would make
# a fresh session look registered, producing UNRESOLVED_ROUTINE at
# analysis. Failures memoize too — one warning, then the inline
# fallback, instead of silently re-extracting and re-failing on every
# application.
_SESSIONS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def lambda_arrows(sql: str) -> str:
    """Rewrite every `lambdafunction(BODY, v1[, v2...])` in generated
    SQL into the parseable `(v1[, v2...]) -> BODY` arrow form, quote-
    and paren-aware. Spark's .sql() escapes an apostrophe inside a
    string literal as backslash-quote ('\\''), so the scanner consumes
    backslash escapes first; the doubled-quote style is handled too,
    defensively."""
    key = "lambdafunction("
    while True:
        i = sql.find(key)
        if i < 0:
            return sql
        j = i + len(key)
        depth, commas, k, in_q = 1, [], j, False
        while depth:
            c = sql[k]
            if in_q:
                if c == "\\":
                    k += 1  # escaped char (incl. \' and \\)
                elif c == "'":
                    if k + 1 < len(sql) and sql[k + 1] == "'":
                        k += 1
                    else:
                        in_q = False
            elif c == "'":
                in_q = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            elif c == "," and depth == 1:
                commas.append(k)
            k += 1
        body = sql[j:commas[0]]
        vars_ = [sql[a + 1:b].strip() for a, b in zip(commas, commas[1:] + [k])]
        vs = vars_[0] if len(vars_) == 1 else "(" + ", ".join(vars_) + ")"
        sql = sql[:i] + f"({vs} -> {body})" + sql[k + 1:]


def _sql_body(spark, name: str, scalar: Callable[[Column], Column]) -> str:
    body = _SQL_BODIES.get(name)
    if body is None:
        plan = (
            spark.createDataFrame([("x",)], ["tok"])
            .select(scalar(F.col("tok")).alias("o"))
            ._jdf.queryExecution().logical()
        )
        body = lambda_arrows(plan.expressions().apply(0).child().sql())
        _SQL_BODIES[name] = body
    return body


def _array_sql_body(spark, name: str,
                    builder: Callable[[Column], Column]) -> str:
    body = _SQL_BODIES.get(name)
    if body is None:
        plan = (
            spark.createDataFrame([(["x"],)], ["toks"])
            .select(builder(F.col("toks")).alias("o"))
            ._jdf.queryExecution().logical()
        )
        body = lambda_arrows(plan.expressions().apply(0).child().sql())
        _SQL_BODIES[name] = body
    return body


def array_fn(name: str, builder: Callable[[Column], Column],
             toks: Column, returns: str = "STRING") -> Column:
    """tokens_fn's ARRAY -> SCALAR sibling (r11): apply `builder` (a
    whole-token-array -> scalar Column program, e.g. the 14-list
    Snowball language-ID argmax) through a once-per-session SQL temp
    function; inline fallback when no session is active or
    registration fails. Same extraction mechanism (the body IS the
    Column program's own unanalyzed-plan SQL, lambdafunctions
    rewritten to arrows) and the same SAME-SESSION CONTRACT as
    tokens_fn. The builder must be a deterministic pure function of
    its input column, and its body's only free reference must be the
    `toks` parameter."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        try:
            states = _SESSIONS.setdefault(spark, {})
        except TypeError:  # pragma: no cover - non-weakrefable session
            states = {}
        ok = states.get(name)
        if ok is None:
            try:
                spark.sql(
                    f"CREATE OR REPLACE TEMPORARY FUNCTION {name}"
                    f"(toks ARRAY<STRING>) RETURNS {returns} RETURN "
                    f"({_array_sql_body(spark, name, builder)})"
                )
                ok = states[name] = True
            except Exception as e:  # pragma: no cover - registration seam
                ok = states[name] = False
                warnings.warn(
                    f"SQL temp-function registration for {name} failed"
                    f" ({e!r:.200}); falling back to the inline Column"
                    " program for this session (correct, but pays the"
                    " per-application tree-construction cost)",
                    RuntimeWarning,
                    stacklevel=2,
                )
        if ok:
            return F.call_function(name, toks)
    return builder(toks)


def scalar_fn(name: str, scalar: Callable[[Column], Column],
              tok: Column, returns: str = "STRING") -> Column:
    """STRING -> scalar sibling (r14): apply `scalar` (a one-string ->
    scalar Column program, e.g. the PSL registrable-domain CASE chain
    or the URL canonicalizer — each a 0.15-0.6 s expression-tree
    CONSTRUCTION per application, measured steady-state) through a
    once-per-session SQL temp function, so every application after the
    first is one `call_function` Py4J call and the body inlines
    JVM-side at analysis. Inline fallback when no session is active or
    registration fails. Same extraction mechanism and SAME-SESSION
    CONTRACT as tokens_fn. The scalar must be a deterministic pure
    function of its input column, and the argument at every call site
    must NOT be an outer lambda variable (SQL-UDF inlining does not
    compose with one — the tokens_fn MISSING_ATTRIBUTES trap); all
    in-repo call sites pass plain column references."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        try:
            states = _SESSIONS.setdefault(spark, {})
        except TypeError:  # pragma: no cover - non-weakrefable session
            states = {}
        ok = states.get(name)
        if ok is None:
            try:
                spark.sql(
                    f"CREATE OR REPLACE TEMPORARY FUNCTION {name}"
                    f"(tok STRING) RETURNS {returns} RETURN "
                    f"({_sql_body(spark, name, scalar)})"
                )
                ok = states[name] = True
            except Exception as e:  # pragma: no cover - registration seam
                ok = states[name] = False
                warnings.warn(
                    f"SQL temp-function registration for {name} failed"
                    f" ({e!r:.200}); falling back to the inline Column"
                    " program for this session (correct, but pays the"
                    " per-application tree-construction cost)",
                    RuntimeWarning,
                    stacklevel=2,
                )
        if ok:
            return F.call_function(name, tok)
    return scalar(tok)


def tokens_fn(name: str, scalar: Callable[[Column], Column],
              toks: Column) -> Column:
    """Apply `scalar` (a one-token -> one-token Column program) to
    EVERY element of a token array through a once-per-session SQL temp
    function named `name`; inline transform() fallback when no session
    is active (plan-only tests) or registration fails. The scalar must
    be a deterministic pure function of its input column.

    SAME-SESSION CONTRACT: the temp function registers against
    ``SparkSession.getActiveSession()`` at COLUMN-CONSTRUCTION time
    (a Column does not know its DataFrame's session), so the returned
    Column must be evaluated under that same session. A Column built
    under one session and evaluated under another — multi-session
    drivers, or a Column object cached across a session restart —
    hits UNRESOLVED_ROUTINE at analysis instead of falling back
    inline (the fallback can only trigger where this function runs).
    Every caller in this repo builds and consumes its Columns inside
    one session; cross-session callers should re-invoke the builder
    (e.g. porter2_stem_tokens) under the consuming session rather
    than caching Column objects, or pass plans as unresolved
    pipeline JSON."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        try:
            states = _SESSIONS.setdefault(spark, {})
        except TypeError:  # pragma: no cover - non-weakrefable session
            states = {}
        ok = states.get(name)
        if ok is None:
            try:
                spark.sql(
                    f"CREATE OR REPLACE TEMPORARY FUNCTION {name}"
                    "(toks ARRAY<STRING>) RETURNS ARRAY<STRING> RETURN "
                    f"transform(toks, tok -> ({_sql_body(spark, name, scalar)}))"
                )
                ok = states[name] = True
            except Exception as e:  # pragma: no cover - registration seam
                ok = states[name] = False
                warnings.warn(
                    f"SQL temp-function registration for {name} failed"
                    f" ({e!r:.200}); falling back to the inline Column"
                    " program for this session (correct, but pays the"
                    " per-application tree-construction cost)",
                    RuntimeWarning,
                    stacklevel=2,
                )
        if ok:
            return F.call_function(name, toks)
    return F.transform(toks, scalar)
