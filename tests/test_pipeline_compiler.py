"""Pipeline-compiler unit tests: stage semantics, Mongo null handling,
error cases (SURVEY §5-3, FIXTURES.md F5)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from route81_spark.pipeline import apply_pipeline, compile_pipeline
from route81_spark.pipeline.exprs import PipelineCompileError


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(_id="a", x=1, y=10.0, s="Hello", tags=["p", "q"], n=None),
            Row(_id="b", x=2, y=20.0, s="World", tags=[], n=None),
            Row(_id="c", x=3, y=None, s=None, tags=None, n=None),
        ],
        schema="_id string, x int, y double, s string, tags array<string>, n string",
    )


def test_match_eq_null_matches_null_rows(spark):
    out = apply_pipeline(_docs(spark), [{"$match": {"y": None}}])
    assert [r["_id"] for r in out.collect()] == ["c"]


def test_match_ne_matches_nulls(spark):
    # Mongo: {s: {$ne: "Hello"}} matches docs where s is missing/null
    out = apply_pipeline(_docs(spark), [{"$match": {"s": {"$ne": "Hello"}}}])
    assert sorted(r["_id"] for r in out.collect()) == ["b", "c"]


def test_match_nin_includes_nulls(spark):
    out = apply_pipeline(_docs(spark), [{"$match": {"s": {"$nin": ["Hello", "World"]}}}])
    assert [r["_id"] for r in out.collect()] == ["c"]


def test_match_in_with_null_matches_null(spark):
    out = apply_pipeline(_docs(spark), [{"$match": {"s": {"$in": ["Hello", None]}}}])
    assert sorted(r["_id"] for r in out.collect()) == ["a", "c"]


def test_match_exists(spark):
    out = apply_pipeline(_docs(spark), [{"$match": {"y": {"$exists": True}}}])
    assert sorted(r["_id"] for r in out.collect()) == ["a", "b"]
    out = apply_pipeline(_docs(spark), [{"$match": {"y": {"$exists": False}}}])
    assert [r["_id"] for r in out.collect()] == ["c"]


def test_match_not_matches_missing(spark):
    # $not{$gt} matches null rows too (Mongo semantics)
    out = apply_pipeline(_docs(spark), [{"$match": {"y": {"$not": {"$gt": 15.0}}}}])
    assert sorted(r["_id"] for r in out.collect()) == ["a", "c"]


def test_match_nor(spark):
    out = apply_pipeline(
        _docs(spark), [{"$match": {"$nor": [{"x": 1}, {"s": "World"}]}}]
    )
    assert [r["_id"] for r in out.collect()] == ["c"]


def test_match_elem_and_size(spark):
    out = apply_pipeline(_docs(spark), [{"$match": {"tags": {"$size": 2}}}])
    assert [r["_id"] for r in out.collect()] == ["a"]
    out = apply_pipeline(_docs(spark), [{"$match": {"tags": {"$elemMatch": {"$eq": "q"}}}}])
    assert [r["_id"] for r in out.collect()] == ["a"]


def test_project_exclusion_and_inclusion(spark):
    d = _docs(spark)
    excl = apply_pipeline(d, [{"$project": {"tags": 0, "n": 0}}])
    assert excl.columns == ["_id", "x", "y", "s"]
    incl = apply_pipeline(d, [{"$project": {"x": 1}}])
    assert incl.columns == ["_id", "x"]  # _id implicitly included
    no_id = apply_pipeline(d, [{"$project": {"_id": 0, "x": 1}}])
    assert no_id.columns == ["x"]


def test_project_mixed_raises(spark):
    with pytest.raises(PipelineCompileError):
        apply_pipeline(_docs(spark), [{"$project": {"x": 1, "y": 0}}])


def test_unwind_variants(spark):
    d = _docs(spark)
    plain = apply_pipeline(d, [{"$unwind": "$tags"}])
    assert sorted((r["_id"], r["tags"]) for r in plain.collect()) == [
        ("a", "p"), ("a", "q"),
    ]
    keep = apply_pipeline(
        d, [{"$unwind": {"path": "$tags", "preserveNullAndEmptyArrays": True}}]
    )
    assert sorted([(r["_id"], r["tags"]) for r in keep.collect()], key=str) == sorted(
        [("a", "p"), ("a", "q"), ("b", None), ("c", None)], key=str
    )
    idx = apply_pipeline(
        d, [{"$unwind": {"path": "$tags", "includeArrayIndex": "i"}}]
    )
    assert sorted((r["_id"], r["i"], r["tags"]) for r in idx.collect()) == [
        ("a", 0, "p"), ("a", 1, "q"),
    ]


def test_group_global_id_null(spark):
    out = apply_pipeline(
        _docs(spark), [{"$group": {"_id": None, "n": {"$sum": 1}, "tot": {"$sum": "$x"}}}]
    ).collect()
    assert len(out) == 1 and out[0]["n"] == 3 and out[0]["tot"] == 6


def test_group_sum_all_null_is_zero(spark):
    # Mongo $sum over no numeric values yields 0, not null
    out = apply_pipeline(
        _docs(spark),
        [{"$match": {"_id": "c"}}, {"$group": {"_id": None, "t": {"$sum": "$y"}}}],
    ).collect()
    assert out[0]["t"] == 0


def test_unknown_stage_and_operator_raise(spark):
    with pytest.raises(PipelineCompileError):
        compile_pipeline([{"$totallyUnknownStage": {}}])
    with pytest.raises(PipelineCompileError):
        apply_pipeline(_docs(spark), [{"$project": {"z": {"$nope": 1}}}])
    # $lookup is supported now, but its args are still hard-validated
    with pytest.raises(PipelineCompileError, match="requires"):
        apply_pipeline(_docs(spark), [{"$lookup": {}}])


def test_expr_operators(spark):
    out = apply_pipeline(
        _docs(spark),
        [
            {"$match": {"_id": "a"}},
            {
                "$project": {
                    "_id": 0,
                    "add": {"$add": ["$x", 1, 2]},
                    "pow": {"$pow": ["$x", 3]},
                    "up": {"$toUpper": "$s"},
                    "ifn": {"$ifNull": ["$n", "dflt"]},
                    "elem": {"$arrayElemAt": ["$tags", -1]},
                    "oob": {"$arrayElemAt": ["$tags", 9]},
                    "lit": {"$literal": "$x"},
                    "sw": {
                        "$switch": {
                            "branches": [{"case": {"$gt": ["$x", 0]}, "then": "pos"}],
                            "default": "neg",
                        }
                    },
                }
            },
        ],
    ).collect()[0]
    assert out["add"] == 4 and out["pow"] == 1.0 and out["up"] == "HELLO"
    assert out["ifn"] == "dflt" and out["elem"] == "q" and out["oob"] is None
    assert out["lit"] == "$x" and out["sw"] == "pos"


def test_extjson_literals_in_expressions(spark):
    out = apply_pipeline(
        _docs(spark),
        [
            {"$match": {"_id": "a"}},
            {
                "$project": {
                    "_id": 0,
                    "n": {"$add": [{"$numberLong": "10"}, "$x"]},
                    "d": {"$literal": "kept"},
                    "ts": {"$date": "2020-01-02T03:04:05Z"},
                }
            },
        ],
    ).collect()[0]
    assert out["n"] == 11 and out["d"] == "kept"
    assert str(out["ts"]).startswith("2020-01-02 03:04:05")


def test_string_replace_ops(spark):
    out = apply_pipeline(
        _docs(spark),
        [
            {"$match": {"_id": "a"}},
            {
                "$project": {
                    "_id": 0,
                    "all": {"$replaceAll": {"input": {"$literal": "a.b.c"}, "find": ".", "replacement": "-"}},
                    "one": {"$replaceOne": {"input": {"$literal": "a.b.c"}, "find": ".", "replacement": "-"}},
                    "none": {"$replaceOne": {"input": {"$literal": "abc"}, "find": "z", "replacement": "-"}},
                    "idx": {"$indexOfArray": ["$tags", "q"]},
                    "miss": {"$indexOfArray": ["$tags", "zz"]},
                }
            },
        ],
    ).collect()[0]
    assert out["all"] == "a-b-c" and out["one"] == "a-b.c" and out["none"] == "abc"
    assert out["idx"] == 1 and out["miss"] == -1


def test_project_nested_dotted(spark):
    df = apply_pipeline(
        _docs(spark),
        [
            {"$match": {"_id": "a"}},
            {"$project": {"_id": 0, "r": {"u": "$x", "v": "$s"}}},
            {"$project": {"r.u": 1}},
        ],
    )
    row = df.collect()[0]
    assert df.columns == ["r"] and row["r"]["u"] == 1


def test_replace_root_and_addfields_nested(spark):
    out = apply_pipeline(
        _docs(spark),
        [
            {"$match": {"_id": "a"}},
            {"$project": {"_id": 0, "r": {"u": "$x", "v": {"$multiply": ["$y", 2]}}}},
            {"$replaceRoot": {"newRoot": "$r"}},
        ],
    ).collect()[0]
    assert out["u"] == 1 and out["v"] == 20.0


def test_merge_objects_accumulator(spark):
    from pyspark.sql import Row
    from route81_spark.pipeline import apply_pipeline
    from route81_spark.pipeline.exprs import PipelineCompileError
    import pytest

    df = spark.createDataFrame(
        [Row(g="a", k=1, s=Row(x=1, y=None)), Row(g="a", k=2, s=Row(x=None, y=2)),
         Row(g="a", k=3, s=Row(x=5, y=None))],
        "g string, k int, s struct<x:int,y:int>",
    )
    out = apply_pipeline(
        df,
        [{"$sort": {"k": 1}}, {"$group": {"_id": "$g", "mo": {"$mergeObjects": "$s"}}}],
    ).collect()[0]
    # later documents override per field; nulls don't clobber
    assert (out["mo"]["x"], out["mo"]["y"]) == (5, 2)
    with pytest.raises(PipelineCompileError, match="sort"):
        apply_pipeline(df, [{"$group": {"_id": "$g", "mo": {"$mergeObjects": "$s"}}}])


def test_lambda_body_control_flow(spark):
    """$cond/$switch and nested higher-order fns inside $map/$filter
    lambda bodies compile through _env_walk (env-threaded recursion)."""
    from route81_spark.pipeline import apply_pipeline

    df = spark.createDataFrame([(1,)], "k int")
    out = apply_pipeline(
        df,
        [
            {
                "$project": {
                    "m": {
                        "$map": {
                            "input": [1, 2, 3],
                            "in": {
                                "$cond": [
                                    {"$gt": ["$$this", 1]},
                                    {"$multiply": ["$$this", 10]},
                                    "$$this",
                                ]
                            },
                        }
                    },
                    "sw": {
                        "$map": {
                            "input": [0, 5],
                            "in": {
                                "$switch": {
                                    "branches": [
                                        {"case": {"$eq": ["$$this", 0]}, "then": "z"},
                                    ],
                                    "default": "nz",
                                }
                            },
                        }
                    },
                    "nested": {
                        "$map": {
                            "input": [[1, 2], [3]],
                            "as": "row",
                            "in": {"$sum": {"$map": {"input": "$$row", "in": {"$add": ["$$this", 1]}}}},
                        }
                    },
                }
            }
        ],
    ).collect()[0]
    assert out["m"] == [1, 20, 30]
    assert out["sw"] == ["z", "nz"]
    assert out["nested"] == [5.0, 4.0]


def test_let_shadowing_and_scalar_agg_semantics(spark):
    from route81_spark.pipeline import apply_pipeline

    df = spark.createDataFrame([(2.0, [4.0, 6.0])], "x double, arr array<double>")
    out = apply_pipeline(
        df,
        [
            {
                "$project": {
                    "outer": {
                        "$let": {
                            "vars": {"v": 1},
                            "in": {
                                "$add": [
                                    "$$v",
                                    {"$let": {"vars": {"v": 100}, "in": "$$v"}},
                                ]
                            },
                        }
                    },
                    # schema-known scalar field: $sum/$max return the value itself
                    "scalar_sum": {"$sum": "$x"},
                    "scalar_max": {"$max": "$x"},
                    # schema-known array field: aggregate semantics
                    "arr_sum": {"$sum": "$arr"},
                    "arr_max": {"$max": "$arr"},
                }
            }
        ],
    ).collect()[0]
    assert out["outer"] == 101
    assert out["scalar_sum"] == 2.0 and out["scalar_max"] == 2.0
    assert out["arr_sum"] == 10.0 and out["arr_max"] == 6.0


def test_match_bits_type_geo_and_out_of_scope(spark):
    import pytest
    from route81_spark.pipeline import apply_pipeline
    from route81_spark.pipeline.exprs import PipelineCompileError

    df = spark.createDataFrame(
        [(5, "a", [1.0, 2.0]), (2, None, [50.0, 50.0])],
        "k int, s string, pt array<double>",
    )
    got = apply_pipeline(df, [{"$match": {"k": {"$bitsAllSet": [0, 2]}}}]).collect()
    assert [r["k"] for r in got] == [5]
    got = apply_pipeline(df, [{"$match": {"k": {"$bitsAnySet": 2}}}]).collect()
    assert [r["k"] for r in got] == [2]
    got = apply_pipeline(df, [{"$match": {"s": {"$type": "string"}}}]).collect()
    assert [r["k"] for r in got] == [5]  # null doesn't match a type
    got = apply_pipeline(df, [{"$match": {"s": {"$type": ["null", "string"]}}}]).collect()
    assert sorted(r["k"] for r in got) == [2, 5]
    got = apply_pipeline(df, [{"$match": {"k": {"$type": "string"}}}]).collect()
    assert got == []  # wrong type constant-folds to false
    got = apply_pipeline(
        df, [{"$match": {"pt": {"$geoWithin": {"$center": [[0, 0], 3]}}}}]
    ).collect()
    assert [r["k"] for r in got] == [5]
    # $comment ignored; $sampleRate compiles to a filter
    assert apply_pipeline(df, [{"$match": {"$comment": "x"}}]).count() == 2
    assert apply_pipeline(df, [{"$match": {"$sampleRate": 1.0}}]).count() == 2
    for bad in ({"$where": "f()"}, {"$jsonSchema": {}}):
        with pytest.raises(PipelineCompileError):
            apply_pipeline(df, [{"$match": bad}])


def test_text_search_subset_semantics(spark):
    """$text engine subset: terms disjunctive, phrases conjunctive and
    overriding loose terms, negation, case folding, $caseSensitive,
    the engine textScore, and the loud failures for unsupported
    options."""
    import pytest
    from pyspark.sql import Row

    from route81_spark.pipeline import apply_pipeline
    from route81_spark.pipeline.exprs import PipelineCompileError

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="Fast table scan with spark"),
            Row(doc_id=2, text="slow merge but fast table wins"),
            Row(doc_id=3, text="vector search only"),
            Row(doc_id=4, text="nothing relevant"),
            Row(doc_id=5, text="spark spark vector"),
        ]
    )

    def run(search, **kw):
        spec = {"$search": search, **kw}
        return sorted(
            r["doc_id"]
            for r in apply_pipeline(df, [{"$match": {"$text": spec}}]).collect()
        )

    # terms are disjunctive (OR)
    assert run("spark vector") == [1, 3, 5]
    # phrase is conjunctive and overrides loose terms for MATCHING
    assert run('vector "fast table"') == [1, 2]
    # negated term excludes
    assert run('"fast table" -merge') == [1]
    # negated phrase excludes
    assert run('spark -"table scan"') == [5]
    # only negations match nothing (Mongo behavior)
    assert run("-spark") == []
    # case folding by default; $caseSensitive honors exact case
    assert run("fast") == [1, 2]
    assert run("fast", **{"$caseSensitive": True}) == [2]
    assert run('"Fast table"', **{"$caseSensitive": True}) == [1]

    # engine textScore: term token occurrences + phrase substring counts
    got = {
        r["doc_id"]: r["score"]
        for r in apply_pipeline(
            df,
            [
                {"$match": {"$text": {"$search": 'spark "fast table"'}}},
                {"$addFields": {"score": {"$meta": "textScore"}}},
            ],
        ).collect()
    }
    assert got == {1: 2, 2: 1}  # doc1: spark(1) + phrase(1); doc2: phrase(1)

    # unsupported requests fail loudly
    with pytest.raises(PipelineCompileError, match="unsupported \\$text"):
        run("x", **{"$bogus": 1})
    with pytest.raises(PipelineCompileError, match="\\$search"):
        apply_pipeline(df, [{"$match": {"$text": {}}}]).collect()
    # the Mongo relevance-sort idiom: {$sort: {s: {$meta: "textScore"}}}
    ranked = apply_pipeline(
        df,
        [
            {"$match": {"$text": {"$search": "spark vector"}}},
            {"$sort": {"s": {"$meta": "textScore"}}},
            {"$limit": 1},
        ],
    ).collect()
    assert [r["doc_id"] for r in ranked] == [5]  # spark(2)+vector(1)=3 tops

    # $meta textScore with no $text in THIS pipeline fails loudly —
    # even right after a $text pipeline ran (the spec is scoped to one
    # pipeline application, not remembered globally; no hand-reset)
    with pytest.raises(PipelineCompileError, match="textScore"):
        apply_pipeline(
            df, [{"$addFields": {"s": {"$meta": "textScore"}}}]
        ).collect()


def test_text_score_scope_is_per_pipeline(spark):
    """Two $text pipelines compiled interleaved must each bind their
    OWN search spec (the r7 wart: a module-global spec could cross-wire
    scores between pipelines)."""
    from route81_spark.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [(1, "spark spark vector"), (2, "vector merge")],
        "doc_id long, text string",
    )

    def text_pipe(search):
        return [
            {"$match": {"$text": {"$search": search}}},
            {"$addFields": {"s": {"$meta": "textScore"}}},
            {"$project": {"doc_id": 1, "s": 1}},
        ]

    # build A, build B, THEN collect both — a global would have left B's
    # spec active when A's plan was still around, and vice versa; the
    # scoped context makes each plan carry its own score expression
    a = apply_pipeline(df, text_pipe("spark"))
    b = apply_pipeline(df, text_pipe("vector"))
    got_a = {r["doc_id"]: r["s"] for r in a.collect()}
    got_b = {r["doc_id"]: r["s"] for r in b.collect()}
    assert got_a == {1: 2}          # 'spark' twice in doc 1
    assert got_b == {1: 1, 2: 1}    # 'vector' once in each


def test_text_diacritic_folding(spark):
    """$diacriticSensitive defaults to FALSE (Mongo's text-index-v3
    default): precomposed, decomposed, and unaccented spellings all
    match and score together; explicit true keeps diacritics
    significant. Folding is one pure-Column translate (ops.unitext
    tables), applied to text AND query literals."""
    from route81_spark.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [
            (1, "café au lait"),            # precomposed é
            (2, "café au lait"),           # decomposed e + U+0301
            (3, "cafe au lait"),                 # plain ASCII
            (4, "jalapeño salsa"),          # ñ folds to n
            (5, "nothing here"),
        ],
        "doc_id long, text string",
    )

    def run(search, **kw):
        spec = {"$search": search, **kw}
        return sorted(
            r["doc_id"]
            for r in apply_pipeline(df, [{"$match": {"$text": spec}}]).collect()
        )

    # default folds: all three café spellings match, accented or not
    assert run("café") == [1, 2, 3]
    assert run("cafe") == [1, 2, 3]
    assert run("jalapeno") == [4]
    assert run('"café au"') == [1, 2, 3]         # phrases fold too
    assert run("café -salsa") == [1, 2, 3]
    # explicit sensitivity: only the byte-identical (NFC) spelling hits
    # (unicode tokenizer — the ASCII one shreds unfolded text at the
    # accent, which is exactly why folding is the default)
    assert run("café", **{"$diacriticSensitive": True, "unicode": True}) == [1]
    # doc 2 is DECOMPOSED: sensitive mode leaves the combining mark,
    # and the unicode tokenizer treats it as a separator ('cafe' + mark
    # -> token 'cafe') — the documented normalize-first divergence
    assert run("cafe", **{"$diacriticSensitive": True, "unicode": True}) == [2, 3]
    # scoring counts folded occurrences identically across spellings
    got = {
        r["doc_id"]: r["s"]
        for r in apply_pipeline(
            df,
            [
                {"$match": {"$text": {"$search": "café"}}},
                {"$addFields": {"s": {"$meta": "textScore"}}},
                {"$project": {"doc_id": 1, "s": 1}},
            ],
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_fold_diacritics_matches_python_twin(spark):
    """Property sweep: the Spark translate and the Python spec twin
    share one table by construction; pin them against each other (and
    the NFD/Mn-Me definition) over a char pool that exercises mapped,
    deleted, and untouched classes."""
    from hypothesis import given, settings, strategies as st

    from route81_spark.ops.unitext import fold_diacritics_py

    import unicodedata

    pool = (
        "abcXYZ09 \téÉñİžёйώ"
        "̧́̈⃐"      # combining marks incl. Me-ish
        "ßøđœﬁ"  # NOT folded: distinct letters
        "ẛỹǐ"
    )

    def spec(s: str) -> str:
        out = []
        for ch in s:
            if unicodedata.category(ch) in ("Mn", "Me"):
                continue
            base = "".join(
                c
                for c in unicodedata.normalize("NFD", ch)
                if unicodedata.category(c) not in ("Mn", "Me")
            )
            out.append(base if (base != ch and len(base) == 1) else ch)
        return "".join(out)

    @given(st.text(alphabet=pool, max_size=40))
    @settings(max_examples=200, deadline=None)
    def check(s):
        assert fold_diacritics_py(s) == spec(s)

    check()

    # one Spark round-trip pins the Column path to the same twin
    rows = [(i, s) for i, s in enumerate(
        ["café", "café", "ßøđ", "йώ",
         "", None, "a⃐b"])]
    from route81_spark.ops.unitext import fold_diacritics

    df = spark.createDataFrame(rows, "i long, t string")
    got = {r["i"]: r["f"] for r in df.select(
        "i", fold_diacritics(F.col("t")).alias("f")).collect()}
    want = {i: fold_diacritics_py(s) for i, s in rows}
    assert got == want


def test_text_s_stemmer(spark):
    """{stem: "s"}: Harman S-stemmer conflates English plurals on
    tokens AND plain terms (queries<->query, tables<->table), phrases
    stay raw; exceptions (-ss/-us/-Xes/-Xies endings) pass through;
    other stem values fail loudly."""
    from route81_spark.ops.text import s_stem_py
    from route81_spark.pipeline import apply_pipeline

    # spec-twin unit pins (first matching ending wins; exceptions stay)
    assert s_stem_py("queries") == "query"
    assert s_stem_py("tables") == "table"
    assert s_stem_py("glasses") == "glasse"   # -es rule, not -ss (len>3)
    assert s_stem_py("class") == "class"      # -ss exception
    assert s_stem_py("focus") == "focus"      # -us exception
    assert s_stem_py("goes") == "goes"        # -oes exception
    assert s_stem_py("aies") == "aies"        # rule-1 exception, no fall-through
    assert s_stem_py("its") == "its"          # <= 3 chars pass

    df = spark.createDataFrame(
        [
            (1, "fast queries win"),
            (2, "one query plan"),
            (3, "many tables scanned"),
            (4, "the focus hypothesis"),
        ],
        "doc_id long, text string",
    )

    def run(search, **kw):
        spec = {"$search": search, **kw}
        return sorted(
            r["doc_id"]
            for r in apply_pipeline(df, [{"$match": {"$text": spec}}]).collect()
        )

    # plural query matches singular doc and vice versa
    assert run("queries", stem="s") == [1, 2]
    assert run("query", stem="s") == [1, 2]
    assert run("table", stem="s") == [3]
    # exception endings don't over-stem ('focus' survives)
    assert run("focus", stem="s") == [4]
    # phrases match RAW text — no stemming inside phrases
    assert run('"fast queries"', stem="s") == [1]
    assert run('"fast query"', stem="s") == []
    # without stem the plural/singular stay distinct
    assert run("queries") == [1]
    # scoring counts stemmed-token matches
    from route81_spark.pipeline import apply_pipeline as ap
    got = {
        r["doc_id"]: r["s"]
        for r in ap(
            df,
            [
                {"$match": {"$text": {"$search": "query", "stem": "s"}}},
                {"$addFields": {"s": {"$meta": "textScore"}}},
                {"$project": {"doc_id": 1, "s": 1}},
            ],
        ).collect()
    }
    assert got == {1: 1, 2: 1}
    # unsupported stem mode fails loudly ("porter" became a real mode
    # in r9 — ops/porter.py)
    with pytest.raises(PipelineCompileError, match="stem"):
        run("x", stem="lovins")


def test_s_stem_column_matches_python_twin(spark):
    """EXHAUSTIVE sweep: every string of length <= 5 over {a,e,i,o,s,u}
    (9331 words — covers all rule endings, every exception, and every
    near-miss) through the Column CASE chain vs the Python twin, in one
    Spark job."""
    from itertools import product

    from route81_spark.ops.text import s_stem, s_stem_py

    alpha = "aeiosu"
    words = [""]
    for n in range(1, 6):
        words += ["".join(p) for p in product(alpha, repeat=n)]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "i long, w string"
    )
    got = {r["i"]: r["s"] for r in
           df.select("i", s_stem(F.col("w")).alias("s")).collect()}
    want = {i: s_stem_py(w) for i, w in enumerate(words)}
    assert got == want


def test_js_accumulators_fail_loudly(spark):
    """$accumulator/$function embed JavaScript — not executable here;
    the compiler must reject them at config time, never run them."""
    import pytest
    from route81_spark.pipeline import apply_pipeline
    from route81_spark.pipeline.exprs import PipelineCompileError

    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(PipelineCompileError):
        apply_pipeline(df, [{"$group": {"_id": None, "x": {"$accumulator": {"init": "function(){}"}}}}])
    with pytest.raises(PipelineCompileError):
        apply_pipeline(df, [{"$project": {"x": {"$function": {"body": "function(){}", "args": [], "lang": "js"}}}}])


def test_datediff_extended_units(spark):
    """$dateDiff counts boundary crossings per unit (quarter/week/
    minute/second/millisecond), not elapsed full units."""
    from route81_spark.pipeline import apply_pipeline

    df = spark.createDataFrame([(1,)], "x int")

    def dd(start, end, unit, **kw):
        spec = {"startDate": {"$toDate": {"$literal": start}},
                "endDate": {"$toDate": {"$literal": end}}, "unit": unit, **kw}
        return apply_pipeline(
            df, [{"$project": {"v": {"$dateDiff": spec}}}]
        ).collect()[0]["v"]

    assert dd("2024-03-31", "2024-04-01", "quarter") == 1  # crosses Q1->Q2
    assert dd("2024-01-07", "2024-01-08", "week", startOfWeek="monday") == 1  # Sun->Mon
    assert dd("2024-01-01 10:00:59", "2024-01-01 10:01:00", "minute") == 1
    assert dd("2024-01-01 10:00:00.9", "2024-01-01 10:00:01.0", "second") == 1
    assert dd("2024-01-01 10:00:00", "2024-01-01 10:00:00.25", "millisecond") == 250


def test_unset_nested_path(spark):
    from pyspark.sql import Row
    from route81_spark.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [Row(k=1, s=Row(a=1, b="x", c=2.0))], "k int, s struct<a:int,b:string,c:double>"
    )
    out = apply_pipeline(df, [{"$unset": ["s.b", "k"]}])
    assert out.columns == ["s"]
    r = out.collect()[0]["s"].asDict()
    assert r == {"a": 1, "c": 2.0}


def test_project_nested_exclusion(spark):
    from pyspark.sql import Row
    from route81_spark.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [Row(k=1, s=Row(a=1, b="x"))], "k int, s struct<a:int,b:string>"
    )
    out = apply_pipeline(df, [{"$project": {"s.b": 0}}])
    assert out.columns == ["k", "s"]
    assert out.collect()[0]["s"].asDict() == {"a": 1}


def test_project_deep_nested_inclusion(spark):
    from pyspark.sql import Row
    from route81_spark.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [Row(k=1, s=Row(a=Row(b=1, c=2), d=3))],
        "k int, s struct<a:struct<b:int,c:int>,d:int>",
    )
    out = apply_pipeline(df, [{"$project": {"k": 1, "s.a.b": 1, "s.d": 1}}])
    r = out.collect()[0]
    assert r["k"] == 1
    assert r["s"].asDict(recursive=True) == {"a": {"b": 1}, "d": 3}


def test_addfields_conflicting_paths_rejected(spark):
    # MongoDB raises a conflicting-path error when a name appears both
    # bare and as a dotted prefix in one $addFields/$set stage; silently
    # merging would make the result depend on spec order
    df = spark.createDataFrame(
        [Row(a=Row(b=1), x=2)], "a struct<b:int>, x int"
    )
    with pytest.raises(PipelineCompileError, match="conflicting paths"):
        apply_pipeline(df, [{"$addFields": {"a": {"$literal": 5}, "a.b": "$x"}}])
    # two dotted updates under the same top are still fine
    out = apply_pipeline(
        spark.createDataFrame([Row(a=Row(b=1, c=2))], "a struct<b:int,c:int>"),
        [{"$addFields": {"a.b": {"$literal": 9}, "a.c": {"$literal": 8}}}],
    ).collect()[0]
    assert out["a"]["b"] == 9 and out["a"]["c"] == 8


def _redact_docs(spark):
    schema = (
        "_id string, level int, "
        "detail struct<level:int, note:string>, "
        "items array<struct<level:int, v:int>>"
    )
    return spark.createDataFrame(
        [
            Row(_id="keepall", level=0, detail=Row(level=2, note="secret"),
                items=[Row(level=2, v=1)]),
            Row(_id="descend", level=1, detail=Row(level=1, note="ok"),
                items=[Row(level=0, v=10), Row(level=2, v=20)]),
            Row(_id="descend2", level=1, detail=Row(level=2, note="secret"),
                items=[]),
            Row(_id="prune", level=2, detail=Row(level=0, note="x"), items=None),
            Row(_id="nulldoc", level=1, detail=None, items=None),
        ],
        schema=schema,
    )


_REDACT_COND = {
    "$switch": {
        "branches": [
            {"case": {"$eq": ["$level", 0]}, "then": "$$KEEP"},
            {"case": {"$eq": ["$level", 1]}, "then": "$$DESCEND"},
        ],
        "default": "$$PRUNE",
    }
}


def test_redact_keep_descend_prune(spark):
    out = {r["_id"]: r for r in apply_pipeline(
        _redact_docs(spark), [{"$redact": _REDACT_COND}]
    ).collect()}
    # level=2 root -> row pruned
    assert set(out) == {"keepall", "descend", "descend2", "nulldoc"}
    # $$KEEP: subtree untouched, even though detail.level would prune
    assert out["keepall"]["detail"]["note"] == "secret"
    assert out["keepall"]["items"][0]["v"] == 1
    # $$DESCEND: subdoc re-evaluated (level=1 -> kept; level=2 -> nulled)
    assert out["descend"]["detail"]["note"] == "ok"
    assert out["descend2"]["detail"] is None
    # array elements: the level=2 element is REMOVED (not nulled),
    # the level=0 element survives via $$KEEP
    assert [e["v"] for e in out["descend"]["items"]] == [10]
    # null embedded values pass through
    assert out["nulldoc"]["detail"] is None and out["nulldoc"]["items"] is None


def test_redact_missing_field_path_is_null(spark):
    # a cond referencing a field absent at some level sees null there:
    # subdocs lack 'level' -> {$lte: [null, 1]} is null -> not DESCEND
    df = spark.createDataFrame(
        [Row(_id="a", level=1, d=Row(x=1))], "_id string, level int, d struct<x:int>"
    )
    out = apply_pipeline(
        df,
        [{"$redact": {"$cond": [{"$lte": ["$level", 1]}, "$$DESCEND", "$$PRUNE"]}}],
    ).collect()
    # root descends (level=1); subdoc cond sees level=null -> pruned -> null
    assert out[0]["d"] is None


def test_text_weighted_fields(spark):
    """{fields: {col: weight}} — the weighted multi-field text-index
    analog: terms match in ANY field, negations must be absent from
    EVERY field, phrases stay within one field's value (no cross-field
    concatenation), textScore sums weight x occurrences per field;
    malformed specs fail loudly."""
    from route81_spark.pipeline import apply_pipeline

    rows = [
        (1, "spark query engine", "rows and tables"),
        (2, "intro", "query planning inside"),
        (3, "alpha beta", "gamma delta"),
        (4, "query", "batch query query"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, title string, body string")

    def run(spec, project_score=False):
        pipe = [{"$match": {"$text": spec}}]
        if project_score:
            pipe += [
                {"$addFields": {"s": {"$meta": "textScore"}}},
                {"$project": {"doc_id": 1, "s": 1}},
            ]
        return apply_pipeline(df, pipe)

    w = {"title": 5, "body": 1}
    got = {
        r["doc_id"]: r["s"]
        for r in run({"$search": "query", "fields": w}, True).collect()
    }
    # 1: 5*1 title; 2: 1*1 body; 4: 5*1 title + 1*2 body
    assert got == {1: 5, 2: 1, 4: 7}
    # negation is absent-from-EVERY-field: batch only in doc4's body
    got2 = {r["doc_id"]
            for r in run({"$search": "query -batch", "fields": w}).collect()}
    assert got2 == {1, 2}
    # a phrase must live inside ONE field: "beta gamma" spans doc3's
    # title/body boundary and must NOT match
    assert run({"$search": '"beta gamma"', "fields": w}).count() == 0
    assert {r["doc_id"] for r in
            run({"$search": '"query planning"', "fields": w}).collect()} == {2}
    # stemming composes per field
    got3 = {
        r["doc_id"]: r["s"]
        for r in run({"$search": "queries tables", "fields": w,
                      "stem": "s"}, True).collect()
    }
    assert got3 == {1: 6, 2: 1, 4: 7}
    # loud rejections: field+fields, empty, non-int / out-of-range
    # weights, bool weights
    for bad in [
        {"$search": "x", "field": "title", "fields": w},
        {"$search": "x", "fields": {}},
        {"$search": "x", "fields": {"title": 0}},
        {"$search": "x", "fields": {"title": 1.5}},
        {"$search": "x", "fields": {"title": True}},
        {"$search": "x", "fields": {"title": 100000}},
    ]:
        with pytest.raises(PipelineCompileError, match="fields|exclusive"):
            run(bad).collect()


def test_text_wildcard_fields(spark):
    """{fields: "$**"} — the wildcard text-index analog: every
    top-level STRING column is searched at weight 1 (non-string
    columns ignored); textScore works off the expanded spec; a
    schema with no string columns fails loudly."""
    from route81_spark.pipeline import apply_pipeline

    rows = [
        (1, "spark engine", "query rows", 7),
        (2, "query intro", "plain body", 7),
        (3, "misc", "nothing", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, title string, body string, n int"
    )
    out = apply_pipeline(
        df,
        [
            {"$match": {"$text": {"$search": "query", "fields": "$**"}}},
            {"$addFields": {"s": {"$meta": "textScore"}}},
            {"$project": {"doc_id": 1, "s": 1}},
        ],
    )
    got = {r["doc_id"]: r["s"] for r in out.collect()}
    assert got == {1: 1, 2: 1}
    nostr = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(PipelineCompileError, match="string columns"):
        apply_pipeline(
            nostr, [{"$match": {"$text": {"$search": "x", "fields": "$**"}}}]
        )


def test_text_wildcard_nested_structs(spark):
    """'$**' descends into STRUCT children as dotted paths (r10) —
    Mongo's wildcard text index indexes nested document string fields;
    arrays/maps are not descended (documented subset), and the
    languageOverride column is excluded from the expansion exactly as
    Mongo never text-indexes the language_override field."""
    from route81_spark.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [
            (1, "spark intro", ("query guide", ("deep query", 4)), ["query"]),
            (2, "plain", ("misc", ("nothing", 4)), ["query"]),
            (3, "query fast", ("misc", ("query query", 4)), []),
        ],
        "doc_id long, title string, "
        "meta struct<head: string, sub: struct<note: string, n: int>>, "
        "tags array<string>",
    )
    out = apply_pipeline(
        df,
        [
            {"$match": {"$text": {"$search": "query", "fields": "$**"}}},
            {"$addFields": {"s": {"$meta": "textScore"}}},
            {"$project": {"doc_id": 1, "s": 1}},
        ],
    )
    # doc1: meta.head 1 + meta.sub.note 1 = 2; doc3: title 1 + note 2 = 3;
    # the tags ARRAY is not descended (doc2 would otherwise match)
    got = {r["doc_id"]: r["s"] for r in out.collect()}
    assert got == {1: 2, 3: 3}

    # languageOverride column excluded: a doc whose lang VALUE contains
    # the query term must not match through the lang column itself
    df2 = spark.createDataFrame(
        [(1, "english", "running hard"), (2, "english", "plain body")],
        "doc_id long, lang string, body string",
    )
    out2 = apply_pipeline(
        df2,
        [{"$match": {"$text": {
            "$search": "english runs", "fields": "$**",
            "$language": "english", "languageOverride": "lang",
        }}}],
    )
    assert {r["doc_id"] for r in out2.collect()} == {1}


def test_text_language_override(spark):
    """{languageOverride: "lang"} — per-document analysis language:
    English docs stem with the active mode, other languages keep raw
    tokens (so a French doc matches only literal stemmed-query-term
    tokens); requires an active stem mode (loud no-op guard)."""
    from route81_spark.pipeline import apply_pipeline

    rows = [
        (1, "en", "running relational work"),
        (2, "fr", "running relational work"),   # raw: no 'run'/'relat'
        (3, "fr", "run the line"),              # literal 'run' matches
        (4, "english", "relations hold"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    spec = {"$search": "runs relation", "$language": "english",
            "languageOverride": "lang"}
    out = apply_pipeline(
        df,
        [
            {"$match": {"$text": spec}},
            {"$addFields": {"s": {"$meta": "textScore"}}},
            {"$project": {"doc_id": 1, "s": 1}},
        ],
    )
    got = {r["doc_id"]: r["s"] for r in out.collect()}
    assert got == {1: 2, 3: 1, 4: 1}
    with pytest.raises(PipelineCompileError, match="languageOverride"):
        apply_pipeline(
            df,
            [{"$match": {"$text": {
                "$search": "x", "languageOverride": "lang",
            }}}],
        )
