"""Bounded gval.Full expression compiler for `delete-id-path`.

The reference compiles both consumer path configs with the FULL gval
expression language (route81.go:323-336): paths plus arithmetic,
comparison, logical operators, the ternary, and string concatenation.
The plain-path subset (dotted fields, [n], ["quoted keys"]) lives in
classify._parse_path; this module adds the OPERATOR subset so composite
or derived delete ids — `meta.region + "-" + meta.id`,
`legacy ? old_id : _id`, `user_id % 1024` — compile to pure Columns
over the declared message schema (one `when()`/expression tree, zero
Python per row, no shuffle).

Loud rejections (config-compile time, not mid-stream): function calls
(route81 registers NO gval functions, so a config using one fails at
eval time against the reference too), dynamic STRING subscripts on a
STRUCT base (`doc[key]` — a struct's field set is closed, so per-row
key resolution can't pick a Column), integer subscripts on a
non-array base, and dynamic array indexes whose DECLARED type is
fractional (float/double/decimal, e.g. any '/' result — gval errors
on non-integer indexes; a silent int cast would truncate). What DOES
compile (r10): integer-valued dynamic subscripts on arrays
(`items[cur]`, `a[i + 1]`) via `F.get` (0-based, null out-of-range;
gval errors out-of-range, a documented divergence in the safe
direction) with element-type tracking through the declared schema so
downstream `.field` access and string-vs-numeric `+` dispatch stay
exact; and string-keyed dynamic subscripts on declared MAP columns
(`attrs[key]`) via `try_element_at` — missing key -> NULL, exactly
gval's nil on an absent Go map key.

Documented typing divergences from gval (which evaluates all
arithmetic in float64): `+ - * %` keep the declared column types, so
64-bit integer arithmetic is EXACT where gval's float64 would round
past 2^53; `/` always compiles to double division (gval parity —
Spark's integer `/` is already double, but we cast explicitly so
decimal inputs can't surprise); `+` is string concatenation when
either operand resolves to a string (gval behavior), numeric addition
otherwise.

Lexing precedence: '-' and '$' are legal INSIDE identifiers after the
first character (Mongo field names like `my-field` — the plain-path
contract predates this module and wins), so `a-b` is ONE field name;
a LEADING '-' is always the operator, so `-x` is unary minus over
path x (a field literally named '-x' stays reachable via the
plain-path compiler, which classify tries first). Write binary minus
with spaces (`a - b`).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<str>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<ident>[A-Za-z_$][\w$-]*)
  | (?P<op>\|\||&&|==|!=|<=|>=|[-+*/%!?:()\[\].,<>])
    """,
    re.VERBOSE,
)

_ESC = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'", "\\": "\\"}


def _expr_error(src: str, pos: int, why: str) -> ValueError:
    return ValueError(
        f"unsupported gval expression {src!r} (at offset {pos}: {why}): "
        "delete-id-path accepts plain paths plus the gval operator "
        "subset — arithmetic (+ - * / %), comparisons (== != < <= > >=),"
        " logical (&& || !), the ternary (a ? b : c), string/number/"
        "true/false/null literals, parentheses, integer-valued "
        "array subscripts (a[0], items[cur]), and string-keyed "
        "subscripts on declared map columns (attrs[key]). Function "
        "calls and string-keyed subscripts on struct bases are not "
        "supported; pre-shape the document with a pipeline stage "
        "instead."
    )


def _tokenize(src: str) -> list[tuple[str, object, int]]:
    out: list[tuple[str, object, int]] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise _expr_error(src, i, f"unexpected character {src[i]!r}")
        kind = m.lastgroup
        if kind == "ws":
            i = m.end()
            continue
        text = m.group(0)
        if kind == "num":
            val: object = float(text) if ("." in text or "e" in text
                                          or "E" in text) else int(text)
        elif kind == "str":
            body, buf, j = text[1:-1], [], 0
            while j < len(body):
                if body[j] == "\\" and j + 1 < len(body):
                    buf.append(_ESC.get(body[j + 1], body[j + 1]))
                    j += 2
                else:
                    buf.append(body[j])
                    j += 1
            val = "".join(buf)
        else:
            val = text
        out.append((kind, val, i))
        i = m.end()
    out.append(("eof", None, len(src)))
    return out


# binding powers (higher binds tighter); ternary is right-associative
_BIN_BP = {
    "||": (20, 21), "&&": (30, 31),
    "==": (40, 41), "!=": (40, 41),
    "<": (50, 51), "<=": (50, 51), ">": (50, 51), ">=": (50, 51),
    "+": (60, 61), "-": (60, 61),
    "*": (70, 71), "/": (70, 71), "%": (70, 71),
}
_TERN_BP = (10, 9)  # right-assoc


class _Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_op(self, op: str):
        kind, val, pos = self.next()
        if kind != "op" or val != op:
            raise _expr_error(self.src, pos, f"expected {op!r}")

    def parse(self):
        ast = self.expr(0)
        kind, _, pos = self.peek()
        if kind != "eof":
            raise _expr_error(self.src, pos, "trailing input")
        return ast

    def expr(self, min_bp: int):
        lhs = self.prefix()
        while True:
            kind, val, pos = self.peek()
            if kind != "op":
                break
            if val == "?" and _TERN_BP[0] >= min_bp:
                self.next()
                a = self.expr(0)
                self.expect_op(":")
                b = self.expr(_TERN_BP[1])
                lhs = ("tern", lhs, a, b)
                continue
            bp = _BIN_BP.get(val)
            if bp is None or bp[0] < min_bp:
                break
            self.next()
            rhs = self.expr(bp[1])
            lhs = ("bin", val, lhs, rhs)
        return lhs

    def prefix(self):
        kind, val, pos = self.next()
        if kind == "num" or kind == "str":
            return ("lit", val)
        if kind == "ident":
            if val == "true":
                return ("lit", True)
            if val == "false":
                return ("lit", False)
            if val == "null":
                return ("lit", None)
            return self.postfix(("path", [val]), pos)
        if kind == "op":
            if val == "(":
                inner = self.expr(0)
                self.expect_op(")")
                return self.postfix_nonpath(inner)
            if val == "-":
                node = self.expr(80)
                # bool is an int subclass — `-true` must stay a runtime
                # negation (type error surface), not fold to -1
                if (node[0] == "lit" and isinstance(node[1], (int, float))
                        and not isinstance(node[1], bool)):
                    return ("lit", -node[1])  # constant-fold -<number>
                return ("un", "-", node)
            if val == "!":
                return ("un", "!", self.expr(80))
            if val == "[":
                raise _expr_error(self.src, pos,
                                  "expression cannot start with an index")
        raise _expr_error(self.src, pos, f"unexpected {val!r}")

    def postfix_nonpath(self, node):
        kind, val, pos = self.peek()
        if kind == "op" and val in (".", "["):
            raise _expr_error(self.src, pos,
                              "subscripts apply to paths, not expressions")
        return node

    def postfix(self, node, start: int):
        while True:
            kind, val, pos = self.peek()
            if kind != "op":
                return node
            if val == ".":
                self.next()
                k2, v2, p2 = self.next()
                if k2 != "ident":
                    raise _expr_error(self.src, p2, "expected field name")
                if node[0] == "path":
                    node[1].append(v2)
                else:
                    node = ("getf", node, v2)
            elif val == "[":
                self.next()
                # literal [n] / ["key"] extend the path (the resolver
                # owns them — exact dtype tracking, map-key access);
                # anything else is a dynamic subscript expression
                k2, v2, p2 = self.peek()
                lit_seg = (k2 == "num" and isinstance(v2, int)) or k2 == "str"
                if node[0] == "path" and lit_seg:
                    save = self.i
                    self.next()
                    k3, v3, p3 = self.peek()
                    if k3 == "op" and v3 == "]":
                        self.next()
                        node[1].append(v2)
                        continue
                    self.i = save  # `[2 + i]` etc: a full expression
                idx = self.expr(0)
                self.expect_op("]")
                node = ("get", node, idx)
            elif val == "(":
                raise _expr_error(
                    self.src, pos,
                    "function calls are not supported (route81 registers "
                    "no gval functions either)"
                )
            else:
                return node


def _kind_of(dt: T.DataType | None) -> str:
    if dt is None:
        return "unknown"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "numeric"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        # distinguished so dynamic subscripts can reject declared-
        # fractional indexes loudly (gval errors on non-integer
        # indexes; a silent cast('int') would truncate). Arithmetic
        # dispatch treats it exactly like "numeric".
        return "float"
    return "other"


Resolver = Callable[[list], tuple[Column, T.DataType | None]]


def _access(node, resolve: Resolver) -> tuple[Column, T.DataType | None]:
    """Compile a path/subscript access chain to (Column, declared
    dtype); dtype goes None (kind 'unknown') only when the schema
    genuinely can't say (e.g. indexing past a declared-untyped hole)."""
    tag = node[0]
    if tag == "path":
        return resolve(node[1])
    if tag == "getf":
        base, dt = _access(node[1], resolve)
        name = node[2]
        fdt = (dt[name].dataType
               if isinstance(dt, T.StructType) and name in dt.fieldNames()
               else None)
        return base.getField(name), fdt
    assert tag == "get"
    base, dt = _access(node[1], resolve)
    idx, ik = _compile(node[2], resolve)
    if isinstance(dt, T.MapType):
        # string-keyed dynamic subscripts (`doc[key]`) compile when —
        # and only when — the declared schema says the base is a MAP:
        # there the key set is open by construction, so per-row key
        # resolution IS expressible (r10; struct bases stay the loud
        # rejection below — a struct's field set is closed and a
        # runtime key cannot pick a Column). Missing key -> NULL via
        # try_element_at, matching gval over a Go map, which yields
        # nil for an absent key (no divergence, unlike the array
        # out-of-range case).
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError(
                "unsupported gval expression: dynamic map subscripts "
                f"need string keys (declared {dt.simpleString()})"
            )
        if ik != "string":
            raise ValueError(
                "unsupported gval expression: subscript on a map-typed "
                "field must be string-valued (declared key type is "
                "string; quote literals, or reference a string column)"
            )
        return F.try_element_at(base, idx), dt.valueType
    if ik in ("string", "bool", "null"):
        raise ValueError(
            "unsupported gval expression: string-keyed dynamic "
            "subscripts compile only against a declared MAP column "
            "(a struct schema's field set is closed — per-row key "
            "resolution cannot pick a Column) — pre-shape the document "
            "with a pipeline stage instead"
        )
    if ik == "float":
        raise ValueError(
            "unsupported gval expression: dynamic array subscript has "
            "a declared fractional type (float/double/decimal — e.g. "
            "the result of '/', which always divides as double) — "
            "gval errors on non-integer indexes, and a silent int cast "
            "would truncate; use an integer-typed expression ('%', "
            "integer columns) instead"
        )
    if dt is not None and not isinstance(dt, T.ArrayType):
        raise ValueError(
            "unsupported gval expression: dynamic subscript applied to "
            f"a non-array field (declared type {dt.simpleString()}) — "
            "only array elements can be indexed by a runtime integer"
        )
    # F.get is 0-based like the literal [n] lane; out-of-range gives
    # NULL (gval errors there — documented safe-direction divergence)
    elem = dt.elementType if isinstance(dt, T.ArrayType) else None
    return F.get(base, idx.cast("int")), elem


def _compile(node, resolve: Resolver) -> tuple[Column, str]:
    tag = node[0]
    if tag == "lit":
        v = node[1]
        kind = ("null" if v is None else "string" if isinstance(v, str)
                else "bool" if isinstance(v, bool) else "numeric")
        return F.lit(v), kind
    if tag in ("path", "get", "getf"):
        col, dt = _access(node, resolve)
        return col, _kind_of(dt)
    if tag == "un":
        col, kind = _compile(node[2], resolve)
        return (~col, "bool") if node[1] == "!" else (-col, kind)
    if tag == "tern":
        c, _ = _compile(node[1], resolve)
        a, ka = _compile(node[2], resolve)
        b, kb = _compile(node[3], resolve)
        return F.when(c, a).otherwise(b), ka if ka == kb else "unknown"
    op = node[1]
    lc, lk = _compile(node[2], resolve)
    rc, rk = _compile(node[3], resolve)
    num = "float" if "float" in (lk, rk) else "numeric"
    if op == "+":
        if "string" in (lk, rk):
            # gval: + concatenates when either operand is a string
            return F.concat(lc.cast("string"), rc.cast("string")), "string"
        return lc + rc, num
    if op == "-":
        return lc - rc, num
    if op == "*":
        return lc * rc, num
    if op == "/":
        # gval parity: always float division (hence kind "float" — a
        # '/' result used as a dynamic array index is rejected loudly)
        return lc.cast("double") / rc.cast("double"), "float"
    if op == "%":
        return lc % rc, num
    if op == "==":
        return lc == rc, "bool"
    if op == "!=":
        return lc != rc, "bool"
    if op == "<":
        return lc < rc, "bool"
    if op == "<=":
        return lc <= rc, "bool"
    if op == ">":
        return lc > rc, "bool"
    if op == ">=":
        return lc >= rc, "bool"
    if op == "&&":
        return lc & rc, "bool"
    if op == "||":
        return lc | rc, "bool"
    raise AssertionError(f"unreachable operator {op!r}")


def compile_gval(src: str, resolve: Resolver) -> Column:
    """Parse + compile a gval operator-subset expression to one Column.
    `resolve(segments)` maps a path (list of field names / int indexes)
    to its (Column, DataType) against the message schema — the caller
    owns anchoring, so classify can keep its quoted-root semantics."""
    return _compile(_Parser(src).parse(), resolve)[0]


# NOTE for callers: try the plain-path compiler FIRST and fall back
# here only when it rejects — the path contract admits field names an
# expression lexer must treat as operators (leading '-', leading
# digits), and plain-first keeps every previously-valid config
# compiling byte-identically.
