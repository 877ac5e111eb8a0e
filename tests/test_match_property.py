"""Property-based $match compiler fuzzing: generate random Mongo query
predicates, compile them with the engine, translate them independently
to DuckDB SQL with the documented null-semantics rules, and require the
surviving row sets to be identical. This guards the whole predicate
dialect, not just the handwritten fixtures (SURVEY §7 hard point 3)."""

from __future__ import annotations

import json

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from route81_spark.pipeline import apply_pipeline

# columns of the lineitem slice we fuzz over (with a null-bearing one)
NUM_COLS = ["l_quantity", "l_discount", "l_orderkey"]
STR_COLS = ["l_returnflag", "l_linestatus", "maybe_null"]


def _sql_field_pred(field: str, op: str, val) -> str:
    lit = f"'{val}'" if isinstance(val, str) else ("NULL" if val is None else repr(val))
    if op == "$eq":
        return f"{field} IS NULL" if val is None else f"{field} = {lit}"
    if op == "$ne":
        return f"{field} IS DISTINCT FROM {lit}"
    if op == "$gt":
        return f"{field} > {lit}"
    if op == "$gte":
        return f"{field} >= {lit}"
    if op == "$lt":
        return f"{field} < {lit}"
    if op == "$lte":
        return f"{field} <= {lit}"
    if op == "$in":
        vals = ", ".join(f"'{v}'" if isinstance(v, str) else repr(v) for v in val if v is not None)
        base = f"{field} IN ({vals})" if vals else "FALSE"
        if any(v is None for v in val):
            return f"({field} IS NULL OR {base})"
        return base
    if op == "$nin":
        inner = _sql_field_pred(field, "$in", val)
        return f"NOT COALESCE({inner}, FALSE)"
    if op == "$exists":
        return f"{field} IS NOT NULL" if val else f"{field} IS NULL"
    raise AssertionError(op)


def _to_sql(q: dict) -> str:
    parts = []
    for key, val in q.items():
        if key == "$and":
            parts.append("(" + " AND ".join(_to_sql(s) for s in val) + ")")
        elif key == "$or":
            parts.append("(" + " OR ".join(_to_sql(s) for s in val) + ")")
        elif key == "$nor":
            inner = " OR ".join(f"COALESCE({_to_sql(s)}, FALSE)" for s in val)
            parts.append(f"(NOT ({inner}))")
        else:
            field = key
            if isinstance(val, dict) and any(k.startswith("$") for k in val):
                for op, v in val.items():
                    if op == "$not":
                        inner_op, inner_v = next(iter(v.items()))
                        parts.append(
                            f"(NOT COALESCE({_sql_field_pred(field, inner_op, inner_v)}, FALSE))"
                        )
                    else:
                        parts.append(_sql_field_pred(field, op, v))
            else:
                parts.append(_sql_field_pred(field, "$eq", val))
    return "(" + " AND ".join(parts) + ")" if parts else "TRUE"


_num_val = st.one_of(
    st.integers(min_value=-5, max_value=60),
    st.sampled_from([0.0, 0.05, 25.5, 49.0]),
)
_str_val = st.sampled_from(["A", "N", "R", "O", "F", "zz", ""])


def _field_clause():
    num = st.tuples(
        st.sampled_from(NUM_COLS),
        st.sampled_from(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin"]),
        _num_val,
    )
    strv = st.tuples(
        st.sampled_from(STR_COLS),
        st.sampled_from(["$eq", "$ne", "$in", "$nin", "$exists", "$not"]),
        _str_val,
    )

    def build(t):
        field, op, val = t
        if op == "$exists":
            return {field: {"$exists": val != ""}}
        if op == "$not":
            return {field: {"$not": {"$eq": val}}}
        if op in ("$in", "$nin"):
            vals = [val, "A" if isinstance(val, str) else 30]
            if isinstance(val, str) and val == "zz":
                vals.append(None)  # exercise null-in-list semantics
            return {field: {op: vals}}
        return {field: val if op == "$eq" else {op: val}}

    return st.one_of(num, strv).map(build)


def _query():
    clause = _field_clause()
    return st.one_of(
        clause,
        st.lists(clause, min_size=2, max_size=3).map(lambda cs: {"$and": cs}),
        st.lists(clause, min_size=2, max_size=3).map(lambda cs: {"$or": cs}),
        st.lists(clause, min_size=2, max_size=2).map(lambda cs: {"$nor": cs}),
    )


@pytest.fixture(scope="module")
def fuzz_env(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .limit(400)
        .selectExpr(
            "l_orderkey", "l_linenumber", "l_quantity", "l_discount",
            "l_returnflag", "l_linestatus",
            "CASE WHEN l_orderkey % 3 = 0 THEN NULL ELSE l_returnflag END AS maybe_null",
        )
        .cache()
    )
    df.count()
    con = duckdb.connect()
    con.register("t", df.toPandas())
    return df, con


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_query())
def test_match_matches_sql_semantics(fuzz_env, q):
    df, con = fuzz_env
    got = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in apply_pipeline(df, [{"$match": q}]).collect()
    }
    sql = f"SELECT l_orderkey, l_linenumber FROM t WHERE {_to_sql(q)}"
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got == want, f"query={json.dumps(q)} sql={sql}"
