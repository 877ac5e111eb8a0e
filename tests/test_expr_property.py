"""Property-based fuzzing of the *expression* dialect: generate random
expression trees (arithmetic / comparison / conditional / string ops)
together with their ANSI-SQL translation, run the pipeline compiler on
Spark and the SQL on DuckDB over the same table, and require identical
results row-for-row.

Complements test_match_property.py (which fuzzes the $match predicate
dialect): here the grammar exercises $add/$subtract/$multiply/$abs/
$floor/$ceil/$cond/$cmp/$concat/$toUpper/$strLenCP/$mod compositions —
integer-exact and string ops only, so comparisons need no rounding."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

SF = "/root/testdata/sf0.001"

# (mongo expr builder, sql builder) pairs composed recursively.
# integer domain keeps everything exact across engines.


def _leaf():
    return st.sampled_from(
        [
            ("$n_nationkey", "n_nationkey"),
            ("$n_regionkey", "n_regionkey"),
            (3, "3"),
            (7, "7"),
            (-2, "-2"),
        ]
    )


def _num(depth: int):
    if depth <= 0:
        return _leaf()

    sub = _num(depth - 1)

    def binop(op, sqlop):
        return st.tuples(sub, sub).map(
            lambda ab: ({op: [ab[0][0], ab[1][0]]}, f"({ab[0][1]} {sqlop} {ab[1][1]})")
        )

    abs_ = sub.map(lambda a: ({"$abs": a[0]}, f"abs({a[1]})"))
    mod_ = st.tuples(sub, st.sampled_from([3, 5, 11])).map(
        lambda am: (
            {"$mod": [{"$abs": am[0][0]}, am[1]]},
            f"(abs({am[0][1]}) % {am[1]})",
        )
    )
    cond = st.tuples(sub, sub, sub).map(
        lambda abc: (
            {"$cond": [{"$gt": [abc[0][0], abc[1][0]]}, abc[1][0], abc[2][0]]},
            f"(CASE WHEN {abc[0][1]} > {abc[1][1]} THEN {abc[1][1]} ELSE {abc[2][1]} END)",
        )
    )
    cmp_ = st.tuples(sub, sub).map(
        lambda ab: (
            {"$cmp": [ab[0][0], ab[1][0]]},
            f"(CASE WHEN {ab[0][1]} < {ab[1][1]} THEN -1 WHEN {ab[0][1]} > {ab[1][1]} THEN 1 ELSE 0 END)",
        )
    )
    return st.one_of(
        _leaf(),
        binop("$add", "+"),
        binop("$subtract", "-"),
        binop("$multiply", "*"),
        abs_,
        mod_,
        cond,
        cmp_,
    )


def _text(depth: int):
    base = st.sampled_from([("$n_name", "n_name"), ("X", "'X'")])
    if depth <= 0:
        return base
    num = _num(1)
    upper = base.map(lambda a: ({"$toUpper": a[0]}, f"upper({a[1]})"))
    concat = st.tuples(base, base).map(
        lambda ab: ({"$concat": [ab[0][0], "-", ab[1][0]]}, f"({ab[0][1]} || '-' || {ab[1][1]})")
    )
    tostr = num.map(lambda a: ({"$toString": a[0]}, f"CAST({a[1]} AS VARCHAR)"))
    return st.one_of(base, upper, concat, tostr)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW nation AS SELECT * FROM read_parquet('{SF}/nation.parquet')")
    return con


@settings(max_examples=40, deadline=None)
@given(expr=_num(2))
def test_numeric_expression_trees_match_duckdb(spark, duck, expr):
    from route81_spark.pipeline import apply_pipeline
    from route81_spark.io import load_table

    mongo, sql = expr
    got = (
        apply_pipeline(
            load_table(spark, SF, "nation"),
            [{"$project": {"k": "$n_nationkey", "v": {"$toLong": mongo}}}],
        )
        .orderBy("k")
        .collect()
    )
    want = duck.execute(
        f"SELECT n_nationkey AS k, CAST({sql} AS BIGINT) AS v FROM nation ORDER BY k"
    ).fetchall()
    assert [(r["k"], r["v"]) for r in got] == [(k, v) for k, v in want]


@settings(max_examples=20, deadline=None)
@given(expr=_text(1))
def test_string_expression_trees_match_duckdb(spark, duck, expr):
    from route81_spark.pipeline import apply_pipeline
    from route81_spark.io import load_table

    mongo, sql = expr
    got = (
        apply_pipeline(
            load_table(spark, SF, "nation"),
            [
                {
                    "$project": {
                        "k": "$n_nationkey",
                        "v": mongo if isinstance(mongo, dict) else {"$concat": [mongo]},
                        "n": {"$strLenCP": mongo if isinstance(mongo, dict) else {"$concat": [mongo]}},
                    }
                }
            ],
        )
        .orderBy("k")
        .collect()
    )
    want = duck.execute(
        f"SELECT n_nationkey AS k, {sql} AS v, CAST(length({sql}) AS INT) AS n "
        "FROM nation ORDER BY k"
    ).fetchall()
    assert [(r["k"], r["v"], r["n"]) for r in got] == [tuple(w) for w in want]
