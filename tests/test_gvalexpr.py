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


def test_plain_paths_still_use_fast_lane(spark):
    # pure paths (incl. quoted keys) keep the existing compiler
    assert _ids(spark, "meta.old_id") == {"L9"}
    assert _ids(spark, 'meta["old_id"]') == {"L9"}


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
