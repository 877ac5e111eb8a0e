"""delete-id-path gval operator subset (sinks/gvalexpr.py): composite
and derived delete ids compile to one Column over the message schema,
exactly the surface route81's gval.Full evaluable gives a config
(route81.go:323-336) minus functions/dynamic subscripts, which fail
loudly at config-compile time."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from route81_spark.sinks.classify import ClassifierConfig, classify


def _df(spark):
    return spark.createDataFrame(
        [
            Row(meta=Row(region="eu", id=7, legacy=True, old_id="L7"),
                data=Row(_id="7", payload="x"), n=3),
            Row(meta=Row(region="us", id=12, legacy=False, old_id="L12"),
                data=Row(_id="12", payload="y"), n=-2),
            # delete: data root is NULL
            Row(meta=Row(region="eu", id=9, legacy=True, old_id="L9"),
                data=None, n=0),
        ]
    )


def _ids(spark, expr):
    out = classify(
        _df(spark),
        ClassifierConfig(document_root_path="data", delete_id_path=expr),
    )
    return {r["doc_id"] for r in out.filter(F.col("is_delete")).collect()}


def test_composite_string_id(spark):
    # gval: + concatenates when either operand is a string
    assert _ids(spark, 'meta.region + "-" + meta.id') == {"eu-9"}


def test_arithmetic_and_precedence(spark):
    assert _ids(spark, "meta.id % 4 + 10 * 2") == {"21"}       # 9%4=1, +20
    assert _ids(spark, "(meta.id + 3) * 2") == {"24"}
    # gval parity: / is ALWAYS float division, even on integers
    assert _ids(spark, "meta.id / 2") == {"4.5"}


def test_ternary_and_logic(spark):
    assert _ids(spark, 'meta.legacy ? meta.old_id : data._id') == {"L9"}
    assert _ids(spark, 'meta.legacy && meta.id > 5 ? "big" : "small"') == {"big"}
    assert _ids(spark, '!meta.legacy || meta.id == 9 ? "a" : "b"') == {"a"}


def test_unary_and_comparisons(spark):
    # NOTE the parens: bare '-meta' lexes as a FIELD NAME — the plain
    # path contract allows '-' in Mongo field names and wins over gval
    # operator lexing (documented in gvalexpr.py); same for 'id-3'
    # without spaces vs 'id - 3'
    assert _ids(spark, "-(meta.id)") == {"-9"}
    assert _ids(spark, "0 - meta.id") == {"-9"}
    assert _ids(spark, 'meta.id >= 9 ? "hi" : "lo"') == {"hi"}
    assert _ids(spark, 'meta.id != 9 ? 1 : 0') == {"0"}


def test_string_escapes_and_literals(spark):
    assert _ids(spark, '"pre\\"fix-" + meta.id') == {'pre"fix-9'}
    # bare 'null'/'true' are FIELD NAMES under the plain-path contract;
    # inside an expression they are gval literals
    assert _ids(spark, 'meta.id == 9 ? null : "x"') == {None}


def test_repeated_segment_resolves_positionally(spark):
    """A later path segment EQUAL to the root name (`a.a`) must descend
    into the field, not silently alias the root column (r8 ADVICE: the
    resolver skipped segments by VALUE, so `a.a + "-"` compiled to the
    whole struct)."""
    df = spark.createDataFrame(
        [
            Row(a=Row(a="inner7", b=1), data=Row(_id="7", v="x")),
            Row(a=Row(a="inner9", b=2), data=None),
        ]
    )
    out = classify(
        df, ClassifierConfig(document_root_path="data",
                             delete_id_path='a.a + "!"'),
    )
    got = {r["doc_id"] for r in out.filter(F.col("is_delete")).collect()}
    assert got == {"inner9!"}


def test_minus_true_does_not_fold(spark):
    """bool is an int subclass: `-true` must NOT constant-fold to the
    number -1 — it compiles to a runtime boolean negation, which Spark
    rejects at analysis (gval parity: a type error, not -1)."""
    with pytest.raises(Exception):
        _ids(spark, "-(true) + 1")


def test_plain_paths_still_use_fast_lane(spark):
    # pure paths (incl. quoted keys) keep the existing compiler
    assert _ids(spark, "meta.old_id") == {"L9"}
    assert _ids(spark, 'meta["old_id"]') == {"L9"}


def _arr_df(spark):
    return spark.createDataFrame(
        [
            Row(items=[Row(tag="a0", w=10), Row(tag="a1", w=11)],
                cur=1, data=Row(_id="1", v="x")),
            Row(items=[Row(tag="b0", w=20), Row(tag="b1", w=21)],
                cur=0, data=None),
        ]
    )


def _arr_ids(spark, expr):
    out = classify(
        _arr_df(spark),
        ClassifierConfig(document_root_path="data", delete_id_path=expr),
    )
    return {r["doc_id"] for r in out.filter(F.col("is_delete")).collect()}


def test_integer_field_subscripts(spark):
    """a[i] with a runtime integer index compiles (F.get, 0-based like
    the literal lane), element dtype tracks through the schema so a
    downstream .field and string-concat dispatch stay exact; an
    out-of-range index yields null (gval errors there — documented
    safe-direction divergence); expression indexes (a[cur + 1]) and
    literal-expression indexes (a[0 + 1]) both work."""
    assert _arr_ids(spark, "items[cur].tag") == {"b0"}
    assert _arr_ids(spark, 'items[cur].tag + "!"') == {"b0!"}
    assert _arr_ids(spark, "items[cur + 1].w") == {"21"}
    assert _arr_ids(spark, "items[cur].w + 1") == {"21"}
    assert _arr_ids(spark, "items[0 + 1].tag") == {"b1"}
    assert _arr_ids(spark, "items[cur + 9].tag") == {None}  # OOB -> null
    # literal lane unchanged: [n] stays a resolver path segment
    assert _arr_ids(spark, "items[0].tag") == {"b0"}


def test_dynamic_subscript_loud_rejections(spark):
    # string-keyed dynamic subscript on a STRUCT base: the field set is
    # closed, per-row key resolution can't pick a Column
    with pytest.raises(ValueError, match="MAP column"):
        _arr_ids(spark, 'items[data.v].tag')
    # dynamic index on a declared non-array
    with pytest.raises(ValueError, match="non-array"):
        _arr_ids(spark, "data[cur]")
    # declared-fractional dynamic index (ADVICE r9): '/' always divides
    # as double, and gval errors on non-integer indexes — reject loudly
    # instead of silently truncating via cast('int')
    with pytest.raises(ValueError, match="fractional"):
        _arr_ids(spark, "items[cur / 2].tag")


def _map_df(spark):
    schema = T.StructType([
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("imap", T.MapType(T.IntegerType(), T.StringType())),
        T.StructField("key", T.StringType()),
        T.StructField("cur", T.IntegerType()),
        T.StructField("data", T.StructType([
            T.StructField("_id", T.StringType()),
            T.StructField("v", T.StringType()),
        ])),
    ])
    return spark.createDataFrame(
        [
            ({"region": "eu", "tier": "gold"}, {1: "x"}, "tier", 1,
             ("1", "x")),
            ({"region": "us"}, {2: "y"}, "region", 0, None),
        ],
        schema,
    )


def _map_ids(spark, expr):
    out = classify(
        _map_df(spark),
        ClassifierConfig(document_root_path="data", delete_id_path=expr),
    )
    return {r["doc_id"] for r in out.filter(F.col("is_delete")).collect()}


def test_map_string_keyed_subscripts(spark):
    """attrs[key] with a runtime string key compiles against a declared
    MAP column (r10): try_element_at, so a missing key yields NULL —
    exactly gval's nil on an absent Go map key (no divergence). Value
    dtype tracks through the schema so string-concat dispatch on '+'
    stays exact; composite keys (key + literal) work too."""
    assert _map_ids(spark, "attrs[key]") == {"us"}
    assert _map_ids(spark, 'attrs[key + "x"]') == {None}  # missing -> NULL
    assert _map_ids(spark, 'attrs["region"] + "-" + attrs[key]') == {"us-us"}
    assert _map_ids(spark, 'attrs[key] + "!"') == {"us!"}
    # literal lane unchanged: ["k"] stays a resolver path segment
    assert _map_ids(spark, 'attrs["region"]') == {"us"}
    # non-string-keyed maps and non-string key expressions stay loud
    with pytest.raises(ValueError, match="string keys"):
        _map_ids(spark, "imap[key]")
    with pytest.raises(ValueError, match="string-valued"):
        _map_ids(spark, "attrs[cur]")


def test_loud_failures(spark):
    for bad, msg in [
        ("foo(meta.id)", "function calls"),
        ("meta[meta.id]", "literal"),
        ("meta.id +", "unexpected"),
        ("meta.id ? 1", "expected ':'"),
        ("@meta", "unexpected character"),
    ]:
        with pytest.raises(ValueError, match="gval|path"):
            _ids(spark, bad)


# ------------------------------------------------------------------
# property fuzz: (1) a minimal-parentheses renderer round-trips through
# the parser (precedence + associativity are exactly the table's);
# (2) compiled Columns agree with an independent Python evaluator on
# typed random expression trees over real rows
# ------------------------------------------------------------------

import math

from hypothesis import given, settings, strategies as st

from route81_spark.sinks.gvalexpr import _BIN_BP, _Parser, compile_gval
from pyspark.sql import types as T


def _render(node, parent_bp: int = 0) -> str:
    tag = node[0]
    if tag == "lit":
        v = node[1]
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
        return repr(v)
    if tag == "path":
        out = str(node[1][0])
        for s in node[1][1:]:
            out += f"[{s}]" if isinstance(s, int) else f".{s}"
        return out
    if tag == "get":
        # dynamic (non-literal) subscript — literal indexes render via
        # the path lane above, matching the parser's literal-first rule
        return f"{_render(node[1], 100)}[{_render(node[2], 0)}]"
    if tag == "un":
        inner = _render(node[2], 80)
        s = f"{node[1]}{inner}" if inner.startswith("(") or node[1] == "!" \
            else f"{node[1]}({inner})"
        return s if parent_bp <= 80 else f"({s})"
    if tag == "tern":
        s = (f"{_render(node[1], 11)} ? {_render(node[2], 0)}"
             f" : {_render(node[3], 9)}")
        return f"({s})" if parent_bp > 10 else s
    _, op, lhs, rhs = node
    lbp, rbp = _BIN_BP[op]
    s = f"{_render(lhs, lbp)} {op} {_render(rhs, rbp)}"
    return f"({s})" if parent_bp > lbp else s


_ROWS = [
    {"a": 3, "b": -2, "x": 1.5, "s": "ab", "t": "b-c", "f": True,
     "arr": [3, 1, 4], "k": 0},
    {"a": -7, "b": 4, "x": -0.25, "s": "", "t": "zz", "f": False,
     "arr": [2, 7, 1], "k": 1},
    {"a": 1, "b": 1, "x": 2.0, "s": "q", "t": "q", "f": True,
     "arr": [5, 0, 9], "k": 1},
]
_SCHEMA = T.StructType([
    T.StructField("a", T.LongType()), T.StructField("b", T.LongType()),
    T.StructField("x", T.DoubleType()), T.StructField("s", T.StringType()),
    T.StructField("t", T.StringType()), T.StructField("f", T.BooleanType()),
    T.StructField("arr", T.ArrayType(T.LongType())),
    T.StructField("k", T.LongType()),
])


def _py_eval(node, row):
    tag = node[0]
    if tag == "lit":
        return node[1]
    if tag == "path":
        v = row[node[1][0]]
        for s in node[1][1:]:
            v = v[s] if isinstance(s, int) else v[s]
        return v
    if tag == "get":
        base = _py_eval(node[1], row)
        i = int(_py_eval(node[2], row))
        # F.get: 0-based, null out-of-range (generator keeps indexes
        # in range so null never propagates into the comparisons)
        return base[i] if 0 <= i < len(base) else None
    if tag == "un":
        v = _py_eval(node[2], row)
        return (not v) if node[1] == "!" else -v
    if tag == "tern":
        return (_py_eval(node[2], row) if _py_eval(node[1], row)
                else _py_eval(node[3], row))
    _, op, lhs, rhs = node
    lv, rv = _py_eval(lhs, row), _py_eval(rhs, row)
    if op == "+":
        if isinstance(lv, str) or isinstance(rv, str):
            return str(lv) + str(rv)
        return lv + rv
    if op == "-":
        return lv - rv
    if op == "*":
        return lv * rv
    if op == "/":
        return float(lv) / float(rv)
    if op == "%":
        # Spark/Go: remainder takes the DIVIDEND's sign (not Python %)
        r = math.fmod(lv, rv)
        return int(r) if isinstance(lv, int) and isinstance(rv, int) else r
    return {"==": lv == rv, "!=": lv != rv, "<": lv < rv, "<=": lv <= rv,
            ">": lv > rv, ">=": lv >= rv,
            "&&": lv and rv, "||": lv or rv}[op]


# dynamic integer subscripts over the array field: index expressions
# stay provably in [0, 2] (k in {0,1}, literal addend in {0,1}) so the
# Python evaluator never has to model null propagation; literal [n]
# indexes ride the PATH lane (("path", ["arr", n])), matching the
# parser's literal-first rule
_GET_LEAVES = st.one_of(
    st.just(("get", ("path", ["arr"]), ("path", ["k"]))),
    st.sampled_from([0, 1]).map(
        lambda v: ("get", ("path", ["arr"]),
                   ("bin", "+", ("path", ["k"]), ("lit", v)))
    ),
)


def _num(depth):
    leaf = st.one_of(
        st.integers(min_value=-9, max_value=9).map(lambda v: ("lit", v)),
        st.sampled_from([("path", ["a"]), ("path", ["b"]), ("path", ["x"]),
                         ("path", ["arr", 0]), ("path", ["arr", 2]),
                         ("path", ["k"])]),
        _GET_LEAVES,
    )
    if depth == 0:
        return leaf
    sub = _num(depth - 1)
    nz = st.integers(min_value=1, max_value=9).map(lambda v: ("lit", v))
    return st.one_of(
        leaf,
        st.tuples(st.sampled_from(["+", "-", "*"]), sub, sub)
        .map(lambda t: ("bin", t[0], t[1], t[2])),
        # nonzero literal divisors: null-vs-exception semantics differ
        st.tuples(st.sampled_from(["/", "%"]), sub, nz)
        .map(lambda t: ("bin", t[0], t[1], t[2])),
        # the parser constant-folds -<number literal>, so the generator
        # mirrors it: unary minus only wraps non-literal operands
        sub.map(lambda n: ("lit", -n[1]) if n[0] == "lit"
                else ("un", "-", n)),
        st.tuples(_bool(depth - 1), sub, sub)
        .map(lambda t: ("tern", t[0], t[1], t[2])),
    )


def _strx(depth):
    leaf = st.one_of(
        st.sampled_from(['x"y', "ab", ""]).map(lambda v: ("lit", v)),
        st.sampled_from([("path", ["s"]), ("path", ["t"])]),
    )
    if depth == 0:
        return leaf
    sub = _strx(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(sub, sub).map(lambda t: ("bin", "+", t[0], t[1])),
        st.tuples(_bool(depth - 1), sub, sub)
        .map(lambda t: ("tern", t[0], t[1], t[2])),
    )


def _bool(depth):
    leaf = st.one_of(
        st.booleans().map(lambda v: ("lit", v)),
        st.just(("path", ["f"])),
    )
    if depth == 0:
        return leaf
    n, s, b = _num(depth - 1), _strx(depth - 1), _bool(depth - 1)
    cmps = st.sampled_from(["==", "!=", "<", "<=", ">", ">="])
    return st.one_of(
        leaf,
        st.tuples(cmps, n, n).map(lambda t: ("bin", t[0], t[1], t[2])),
        st.tuples(cmps, s, s).map(lambda t: ("bin", t[0], t[1], t[2])),
        st.tuples(st.sampled_from(["&&", "||"]), b, b)
        .map(lambda t: ("bin", t[0], t[1], t[2])),
        b.map(lambda x: ("un", "!", x)),
    )


_EXPRS = st.one_of(_num(3), _strx(3), _bool(3))


@given(st.lists(_EXPRS, min_size=1, max_size=8))
@settings(max_examples=30, deadline=None)
def test_render_roundtrip(asts):
    """Minimal-parens rendering reparses to the identical AST — the
    printed precedence/associativity IS the parser's."""
    for ast in asts:
        assert _Parser(_render(ast)).parse() == ast


def test_semantics_match_python_evaluator(spark):
    """Compiled Columns agree with the independent Python evaluator on
    a fixed corpus of random typed trees over real rows (one Spark job
    for the whole corpus)."""
    collected = []

    @given(_EXPRS)
    @settings(max_examples=60, deadline=None, database=None)
    def gather(ast):
        collected.append(ast)

    gather()
    corpus = collected[:60]

    def resolve(segs):
        col = F.col(str(segs[0]))
        dt = dict(zip(
            [f.name for f in _SCHEMA.fields],
            [f.dataType for f in _SCHEMA.fields],
        ))[segs[0]]
        for s in segs[1:]:
            if isinstance(s, int):
                col, dt = col.getItem(s), dt.elementType
            else:
                col, dt = col.getField(s), dt[s].dataType
        return col, dt

    df = spark.createDataFrame(_ROWS, _SCHEMA)
    cols = [
        compile_gval(_render(ast), resolve).alias(f"c{i}")
        for i, ast in enumerate(corpus)
    ]
    got = df.select(*cols).collect()
    for ri, row in enumerate(_ROWS):
        for i, ast in enumerate(corpus):
            want = _py_eval(ast, row)
            g = got[ri][f"c{i}"]
            if isinstance(want, float) or isinstance(g, float):
                assert g == pytest.approx(want, abs=1e-12), (ast, row, g, want)
            else:
                assert g == want, (ast, row, g, want)
