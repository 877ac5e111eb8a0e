"""Tier-3 pipeline stages: $lookup, $bucket, $bucketAuto, $facet,
$setWindowFields. route81 forwards arbitrary stage JSON to the server
(route81.go:181-197), so real configs can carry these; here they compile
to joins / width-bucketing / windows instead of being delegated."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from route81_spark.pipeline import apply_pipeline
from route81_spark.pipeline import compiler
from route81_spark.pipeline.exprs import PipelineCompileError


@pytest.fixture()
def resolver(spark):
    nation = spark.createDataFrame(
        [Row(nk=1, name="A"), Row(nk=2, name="B"), Row(nk=None, name="NULLKEY")],
        "nk long, name string",
    )
    compiler.set_collection_resolver(lambda n: {"nation": nation}[n])
    yield
    compiler.set_collection_resolver(None)


def test_lookup_matches_and_empty(spark, resolver):
    df = spark.createDataFrame(
        [Row(i=1, nk=1), Row(i=2, nk=9), Row(i=3, nk=None)], "i long, nk long"
    )
    out = apply_pipeline(
        df,
        [{"$lookup": {"from": "nation", "localField": "nk", "foreignField": "nk", "as": "n"}}],
    )
    rows = {r["i"]: r["n"] for r in out.collect()}
    assert [m["name"] for m in rows[1]] == ["A"]
    assert rows[2] == []  # no match -> empty array, not null
    # Mongo: null localField matches null foreignField
    assert [m["name"] for m in rows[3]] == ["NULLKEY"]


def test_lookup_requires_resolver(spark):
    compiler.set_collection_resolver(None)
    df = spark.createDataFrame([Row(i=1)], "i long")
    with pytest.raises(PipelineCompileError, match="resolver"):
        apply_pipeline(
            df,
            [{"$lookup": {"from": "x", "localField": "i", "foreignField": "i", "as": "y"}}],
        )


def test_bucket_boundaries_and_default(spark):
    df = spark.createDataFrame(
        [Row(v=None if x is None else float(x)) for x in [0, 4, 5, 9, 10, -3, None]],
        "v double",
    )
    out = apply_pipeline(
        df,
        [{"$bucket": {"groupBy": "$v", "boundaries": [0, 5, 10], "default": "other"}}],
    )
    got = {r["_id"]: r["count"] for r in out.collect()}
    # [0,5): 0,4  [5,10): 5,9  out-of-range: 10,-3,null
    assert got == {"0": 2, "5": 2, "other": 3}


def test_bucket_requires_sorted_bounds_and_default(spark):
    df = spark.createDataFrame([Row(v=1)], "v int")
    with pytest.raises(PipelineCompileError):
        apply_pipeline(df, [{"$bucket": {"groupBy": "$v", "boundaries": [5, 1], "default": 0}}])
    with pytest.raises(PipelineCompileError, match="default"):
        apply_pipeline(df, [{"$bucket": {"groupBy": "$v", "boundaries": [0, 5]}}])


def test_bucket_auto_even_counts_and_boundaries(spark):
    df = spark.createDataFrame([Row(k=i) for i in range(1, 9)], "k long")
    out = apply_pipeline(df, [{"$bucketAuto": {"groupBy": "$k", "buckets": 4}}])
    rows = sorted(out.collect(), key=lambda r: r["_id"]["min"])
    assert [r["count"] for r in rows] == [2, 2, 2, 2]
    # each bucket's max is the next bucket's min; last is the global max
    assert [(r["_id"]["min"], r["_id"]["max"]) for r in rows] == [
        (1, 3), (3, 5), (5, 7), (7, 8)
    ]


def test_facet_shapes(spark):
    df = spark.createDataFrame([Row(g="a", v=1), Row(g="a", v=2), Row(g="b", v=3)],
                               "g string, v int")
    out = apply_pipeline(
        df,
        [
            {
                "$facet": {
                    "counts": [{"$count": "n"}],
                    "per_g": [{"$group": {"_id": "$g", "s": {"$sum": "$v"}}}],
                }
            }
        ],
    ).collect()
    assert len(out) == 1
    assert out[0]["counts"][0]["n"] == 3
    assert {(r["_id"], r["s"]) for r in out[0]["per_g"]} == {("a", 3), ("b", 3)}


def test_set_window_fields_rank_requires_sort(spark):
    df = spark.createDataFrame([Row(v=1)], "v int")
    with pytest.raises(PipelineCompileError, match="sortBy"):
        apply_pipeline(
            df,
            [{"$setWindowFields": {"output": {"r": {"$rank": {}}}}}],
        )


def test_set_window_fields_bounded_window(spark):
    df = spark.createDataFrame([Row(g="a", k=i, v=i) for i in range(1, 6)],
                               "g string, k int, v int")
    out = apply_pipeline(
        df,
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$g",
                    "sortBy": {"k": 1},
                    "output": {
                        # trailing window of the last 2 docs (previous + current)
                        "s2": {"$sum": "$v", "window": {"documents": [-1, "current"]}},
                        "total": {"$sum": "$v"},  # default: whole partition
                        "nxt": {"$shift": {"output": "$v", "by": 1, "default": -1}},
                    },
                }
            }
        ],
    )
    rows = sorted(out.collect(), key=lambda r: r["k"])
    assert [r["s2"] for r in rows] == [1, 3, 5, 7, 9]
    assert [r["total"] for r in rows] == [15] * 5
    assert [r["nxt"] for r in rows] == [2, 3, 4, 5, -1]


def test_graph_lookup_chain_and_cycle(spark):
    emp = spark.createDataFrame(
        [Row(name="a", boss=None), Row(name="b", boss="a"), Row(name="c", boss="b"),
         Row(name="d", boss="c"), Row(name="x", boss="y"), Row(name="y", boss="x")],
        "name string, boss string",
    )
    compiler.set_collection_resolver(lambda n: {"emp": emp}[n])
    try:
        out = apply_pipeline(
            emp,
            [
                {
                    "$graphLookup": {
                        "from": "emp",
                        "startWith": "$boss",
                        "connectFromField": "boss",
                        "connectToField": "name",
                        "as": "chain",
                        "depthField": "d",
                    }
                }
            ],
        )
        rows = {r["name"]: [(e["name"], e["d"]) for e in r["chain"]] for r in out.collect()}
    finally:
        compiler.set_collection_resolver(None)
    assert rows["a"] == []  # null boss -> no chain
    assert rows["d"] == [("a", 2), ("b", 1), ("c", 0)]  # BFS min-depths
    # cycle x <-> y terminates and includes the self through the cycle
    assert rows["x"] == [("x", 1), ("y", 0)]


def test_fill_methods(spark):
    df = spark.createDataFrame(
        [Row(g="a", k=1, v=10.0), Row(g="a", k=2, v=None), Row(g="a", k=3, v=None),
         Row(g="a", k=4, v=40.0), Row(g="b", k=1, v=None), Row(g="b", k=2, v=5.0)],
        "g string, k int, v double",
    )
    lin = apply_pipeline(
        df,
        [{"$fill": {"partitionByFields": ["g"], "sortBy": {"k": 1},
                    "output": {"v": {"method": "linear"}}}}],
    )
    vals = {(r["g"], r["k"]): r["v"] for r in lin.collect()}
    assert vals[("a", 2)] == 20.0 and vals[("a", 3)] == 30.0
    assert vals[("b", 1)] is None  # no preceding point -> stays null
    locf = apply_pipeline(
        df,
        [{"$fill": {"partitionByFields": ["g"], "sortBy": {"k": 1},
                    "output": {"v": {"method": "locf"}}}}],
    )
    vals = {(r["g"], r["k"]): r["v"] for r in locf.collect()}
    assert vals[("a", 3)] == 10.0 and vals[("b", 1)] is None
    const = apply_pipeline(df, [{"$fill": {"output": {"v": {"value": -1}}}}])
    assert sorted(r["v"] for r in const.collect()) == [-1.0, -1.0, -1.0, 5.0, 10.0, 40.0]


def test_densify_partition_and_explicit_bounds(spark):
    sparse = spark.createDataFrame(
        [Row(g="a", k=1), Row(g="a", k=5), Row(g="b", k=10), Row(g="b", k=12)],
        "g string, k int",
    )
    part = apply_pipeline(
        sparse,
        [{"$densify": {"field": "k", "partitionByFields": ["g"],
                       "range": {"step": 1, "bounds": "partition"}}}],
    )
    assert sorted((r["g"], r["k"]) for r in part.collect()) == [
        ("a", 1), ("a", 2), ("a", 3), ("a", 4), ("a", 5),
        ("b", 10), ("b", 11), ("b", 12),
    ]
    # explicit [lo, hi) bounds: generated rows carry nulls elsewhere
    explicit = apply_pipeline(
        sparse, [{"$densify": {"field": "k", "range": {"step": 2, "bounds": [0, 7]}}}]
    )
    got = sorted(((r["g"], r["k"]) for r in explicit.collect()), key=str)
    assert (None, 0) in got and (None, 6) in got and (None, 8) not in got


def test_merge_modes(spark):
    target = spark.createDataFrame(
        [Row(_id=1, a="t1", b=10), Row(_id=2, a="t2", b=20)],
        "_id long, a string, b int",
    )
    source = spark.createDataFrame(
        [Row(_id=2, a="s2", b=None), Row(_id=3, a="s3", b=30)],
        "_id long, a string, b int",
    )
    compiler.set_collection_resolver(lambda n: {"tgt": target}[n])
    try:
        def run(wm, wnm="insert"):
            out = apply_pipeline(
                source, [{"$merge": {"into": "tgt", "on": "_id",
                                     "whenMatched": wm, "whenNotMatched": wnm}}]
            )
            return {r["_id"]: (r["a"], r["b"]) for r in out.collect()}

        assert run("replace") == {1: ("t1", 10), 2: ("s2", None), 3: ("s3", 30)}
        # merge: source fields overwrite, target fills source nulls
        assert run("merge") == {1: ("t1", 10), 2: ("s2", 20), 3: ("s3", 30)}
        assert run("keepExisting") == {1: ("t1", 10), 2: ("t2", 20), 3: ("s3", 30)}
        assert run("replace", "discard") == {1: ("t1", 10), 2: ("s2", None)}
        with pytest.raises(RuntimeError, match="whenMatched=fail"):
            run("fail")
        with pytest.raises(RuntimeError, match="whenNotMatched=fail"):
            run("replace", "fail")
    finally:
        compiler.set_collection_resolver(None)


def test_out_writer_hook(spark):
    captured = {}
    compiler.set_collection_writer(lambda name, df: captured.update({name: df.count()}))
    try:
        df = spark.createDataFrame([Row(v=1), Row(v=2)], "v int")
        out = apply_pipeline(df, [{"$match": {"v": {"$gt": 1}}}, {"$out": "dest"}])
        assert out.count() == 1
        assert captured == {"dest": 1}
    finally:
        compiler.set_collection_writer(None)


def test_union_with(spark):
    a = spark.createDataFrame([Row(x=1)], "x int")
    b = spark.createDataFrame([Row(x=2, y="b")], "x int, y string")
    compiler.set_collection_resolver(lambda n: {"b": b}[n])
    try:
        out = apply_pipeline(a, [{"$unionWith": "b"}])
        rows = sorted(out.collect(), key=lambda r: r["x"])
        assert [(r["x"], r["y"]) for r in rows] == [(1, None), (2, "b")]
    finally:
        compiler.set_collection_resolver(None)


def test_window_fill_and_stats_ops(spark):
    df = spark.createDataFrame(
        [Row(g="a", k=1, v=10.0), Row(g="a", k=2, v=None), Row(g="a", k=3, v=30.0)],
        "g string, k int, v double",
    )
    out = apply_pipeline(
        df,
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$g",
                    "sortBy": {"k": 1},
                    "output": {
                        "filled": {"$locf": "$v"},
                        "lin": {"$linearFill": "$v"},
                        "sd": {"$stdDevPop": "$k"},
                        "cov": {"$covariancePop": ["$k", "$k"]},
                    },
                }
            }
        ],
    )
    rows = {r["k"]: r for r in out.collect()}
    assert rows[2]["filled"] == 10.0 and rows[2]["lin"] == 20.0
    assert rows[1]["sd"] == pytest.approx((2 / 3) ** 0.5)
    assert rows[1]["cov"] == pytest.approx(2 / 3)


def test_geo_near_spherical_and_single_key(spark):
    import math

    df = spark.createDataFrame(
        [Row(i=1, loc=[0.0, 0.0]), Row(i=2, loc=[90.0, 0.0]), Row(i=3, loc=[0.0, 90.0])],
        "i long, loc array<double>",
    )
    out = apply_pipeline(
        df,
        [
            {
                "$geoNear": {
                    "near": [0, 0],
                    "key": "loc",
                    "distanceField": "d",
                    "spherical": True,
                }
            }
        ],
    ).collect()
    assert [r["i"] for r in out] == [1, 2, 3] or [r["i"] for r in out][0] == 1
    dists = {r["i"]: r["d"] for r in out}
    assert dists[1] == pytest.approx(0.0)
    # quarter great-circle = pi/2 radians on the unit sphere
    assert dists[2] == pytest.approx(math.pi / 2)
    assert dists[3] == pytest.approx(math.pi / 2)


def test_lookup_pipeline_form_limit_and_guards(spark):
    import pytest
    from route81_spark.pipeline import apply_pipeline
    from route81_spark.pipeline import compiler
    from route81_spark.pipeline.exprs import PipelineCompileError

    left = spark.createDataFrame([(1,), (2,)], "k int")
    right = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 5)], "fk int, v int"
    )
    compiler.set_collection_resolver(lambda name: right)
    try:
        out = apply_pipeline(
            left,
            [
                {
                    "$lookup": {
                        "from": "right",
                        "let": {"kk": "$k"},
                        "pipeline": [
                            {"$match": {"$expr": {"$eq": ["$$kk", "$fk"]}}},
                            {"$project": {"v": 1}},
                            {"$limit": 2},
                        ],
                        "as": "m",
                    }
                }
            ],
        ).collect()
        by_k = {r["k"]: [m["v"] for m in r["m"]] for r in out}
        assert by_k == {1: [10, 20], 2: [5]}  # sorted, limited per key
        # let vars outside the leading $match must fail loudly
        with pytest.raises(PipelineCompileError, match="let variables"):
            apply_pipeline(
                left,
                [
                    {
                        "$lookup": {
                            "from": "right",
                            "let": {"kk": "$k"},
                            "pipeline": [
                                {"$match": {"$expr": {"$eq": ["$$kk", "$fk"]}}},
                                {"$addFields": {"w": "$$kk"}},
                            ],
                            "as": "m",
                        }
                    }
                ],
            )
        # non-row-local sub-stage must fail loudly
        with pytest.raises(PipelineCompileError, match="row-local"):
            apply_pipeline(
                left,
                [
                    {
                        "$lookup": {
                            "from": "right",
                            "let": {"kk": "$k"},
                            "pipeline": [
                                {"$match": {"$expr": {"$eq": ["$$kk", "$fk"]}}},
                                {"$group": {"_id": None}},
                            ],
                            "as": "m",
                        }
                    }
                ],
            )
    finally:
        compiler.set_collection_resolver(None)


def test_new_extension_stages_compile_and_run(spark):
    """Round-4 extension stages through the pipeline-JSON surface:
    $piiRedact, $gopherFilter, $chunk, $stratifiedSample, $curate."""
    from pyspark.sql import Row

    from route81_spark.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en",
                text="the cat and the dog of a to mail a.b@x.co now"),
            Row(doc_id=2, lang="en",
                text="spam spam spam spam spam spam spam spam spam"),
            Row(doc_id=3, lang="xx", text="xyzzy plugh foo bar baz qux"),
        ],
        "doc_id long, lang string, text string",
    )
    out = apply_pipeline(
        df,
        [
            {"$piiRedact": {"counts": True}},
            {"$gopherFilter": {}},
        ],
    ).collect()
    assert [r["doc_id"] for r in out] == [1]          # spam + non-stopword docs drop
    assert "<EMAIL>" in out[0]["text"] and out[0]["n_emails"] == 1

    chunks = apply_pipeline(
        df, [{"$chunk": {"chunkTokens": 5, "overlap": 1}}]
    ).collect()
    assert {r["doc_id"] for r in chunks} == {1, 2, 3}
    assert all(set(r.asDict()) == {"doc_id", "chunk_idx", "chunk_text", "n_tokens"}
               for r in chunks)

    sampled = apply_pipeline(
        df,
        [{"$stratifiedSample": {"strataField": "lang",
                                "fractions": {"en": 1.0}}}],
    ).collect()
    assert {r["doc_id"] for r in sampled} == {1, 2}   # en kept fully, xx dropped

    curated = apply_pipeline(
        df, [{"$curate": {"minTokens": 3, "minQuality": 0.0}}]
    ).collect()
    assert {r["doc_id"] for r in curated} <= {1, 2}   # lang gate drops doc 3


def test_round5_extension_stages_compile_and_run(spark):
    """$lmScore, $boilerplate, $mixtureResample, $selectTopK,
    $tokenizeIds through the pipeline-JSON surface."""
    from pyspark.sql import Row

    from route81_spark.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [
            Row(doc_id=1, src="a", text="one two three four u1 u2 u3 u4"),
            Row(doc_id=2, src="a", text="one two three four v1 v2 v3 v4"),
            Row(doc_id=3, src="a", text="one two three four w1 w2 w3 w4"),
            Row(doc_id=4, src="b", text="solo text entirely unique here ok"),
        ],
        "doc_id long, src string, text string",
    )

    lm = apply_pipeline(df, [{"$lmScore": {}}]).collect()
    assert {r["doc_id"] for r in lm} == {1, 2, 3, 4}
    assert all(r["nll"] > 0 for r in lm)

    bp = {r["doc_id"]: r for r in apply_pipeline(
        df, [{"$boilerplate": {"window": 4, "maxDocs": 2}}]
    ).collect()}
    assert bp[1]["clean_text"] == "u1 u2 u3 u4"
    assert bp[4]["clean_text"] == "solo text entirely unique here ok"

    mixed = apply_pipeline(
        df, [{"$mixtureResample": {"groupField": "src",
                                   "shares": {"a": 0.5, "b": 0.5}}}]
    ).collect()
    assert {r["doc_id"] for r in mixed} >= {4}  # binding group keeps all

    from pyspark.sql import functions as SF

    top = apply_pipeline(
        df.withColumn("score", SF.col("doc_id").cast("double")),
        [{"$selectTopK": {"groupField": "src", "scoreField": "score", "k": 1}}],
    ).collect()
    assert {r["doc_id"] for r in top} == {3, 4}

    ids = apply_pipeline(df, [{"$tokenizeIds": {"maxVocab": 4}}]).collect()
    assert {r["doc_id"] for r in ids} == {1, 2, 3, 4}
    # 'one two three four' are the only repeated terms -> the vocab;
    # every other token encodes as unk (-1)
    by_pos = {(r["doc_id"], r["pos"]): r["token_id"] for r in ids}
    assert by_pos[(1, 0)] != -1 and by_pos[(1, 4)] == -1


def test_round6_extension_stages_compile_and_run(spark):
    """$sessionize, $rollupTime, $scd2History, $datasetCard through the
    pipeline-JSON surface."""
    import datetime as dt

    from route81_spark.pipeline import apply_pipeline

    def ts(s):
        return dt.datetime.fromisoformat(s)

    ev = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 1.0),
            (1, ts("2024-01-01 10:10:00"), 2.0),
            (1, ts("2024-01-01 12:00:00"), 4.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    sess = apply_pipeline(ev, [{"$sessionize": {"gap": "30 minutes"}}]).collect()
    assert sorted(r["n_events"] for r in sess) == [1, 2]

    roll = apply_pipeline(
        ev, [{"$rollupTime": {"resolutions": ["day", "hour"]}}]
    ).collect()
    assert {r["resolution"] for r in roll} == {"day", "hour"}
    day = [r for r in roll if r["resolution"] == "day"][0]
    assert day["n"] == 3 and day["total"] == 7.0

    ch = spark.createDataFrame(
        [("a", 1, False, "v1"), ("a", 2, True, None)],
        "doc_id string, seq long, is_delete boolean, payload string",
    )
    hist = apply_pipeline(ch, [{"$scd2History": {}}]).collect()
    assert len(hist) == 1 and hist[0]["valid_to"] == 2 and not hist[0]["is_current"]

    docs = spark.createDataFrame(
        [(1, "hello world", "en", "web"), (2, "hello world", "en", "web")],
        "doc_id long, text string, lang string, source string",
    )
    card = apply_pipeline(docs, [{"$datasetCard": {}}]).collect()
    assert len(card) == 1 and card[0]["n_docs"] == 2 and card[0]["dup_rate"] == 0.5


def test_asof_and_range_join_stages(spark):
    """$asofJoin / $rangeJoin resolve their right side through the
    $lookup collection resolver."""
    import datetime as dt

    from route81_spark.pipeline import apply_pipeline, compiler

    def ts(s):
        return dt.datetime.fromisoformat(s)

    trades = spark.createDataFrame(
        [(1, ts("2024-01-01 10:06:00"))], "key int, ts timestamp"
    )
    quotes = spark.createDataFrame(
        [(1, ts("2024-01-01 10:05:00"), 101.0)], "key int, ts timestamp, px double"
    )
    windows = spark.createDataFrame(
        [(7, 1, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))],
        "w_id int, key int, start timestamp, end timestamp",
    )
    compiler.set_collection_resolver(
        lambda n: {"quotes": quotes, "windows": windows}[n]
    )
    try:
        out = apply_pipeline(
            trades, [{"$asofJoin": {"from": "quotes", "on": "key"}}]
        ).collect()
        assert out[0]["px"] == 101.0 and out[0]["ts_r"] == ts("2024-01-01 10:05:00")

        rj = apply_pipeline(
            trades, [{"$rangeJoin": {"from": "windows", "on": "key",
                                     "bucketS": 600}}]
        ).collect()
        assert len(rj) == 1 and rj[0]["w_id"] == 7
    finally:
        compiler.set_collection_resolver(None)


def test_weighted_sample_stage(spark):
    from pyspark.sql import functions as SF

    from route81_spark.pipeline import apply_pipeline

    df = spark.range(100).select(
        SF.col("id").alias("doc_id"), (SF.col("id") % 7 + 1.0).alias("w")
    )
    out = apply_pipeline(
        df, [{"$weightedSample": {"weightField": "w", "k": 10}}]
    ).collect()
    assert len(out) == 10


def test_bm25_and_phrase_stages(spark):
    from route81_spark.pipeline import apply_pipeline

    docs = spark.createDataFrame(
        [(1, "big data systems"), (2, "data big"), (3, "small files")],
        "doc_id long, text string",
    )
    scored = apply_pipeline(docs, [{"$bm25": {"terms": ["data"]}}]).collect()
    by_id = {r["doc_id"]: r["bm25"] for r in scored}
    assert by_id[1] > 0 and by_id[2] > 0 and by_id[3] == 0.0

    hits = apply_pipeline(
        docs, [{"$phraseSearch": {"phrase": ["big", "data"]}}]
    ).collect()
    assert {r["doc_id"] for r in hits} == {1}


def test_dedup_and_selection_stages(spark):
    from pyspark.sql import functions as SF

    from route81_spark.pipeline import apply_pipeline

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", 0.9),
            (2, "the quick brown fox jumps over the lazy dogs", 0.5),
            (3, "a completely different document lives here now", 0.7),
        ],
        "doc_id long, text string, quality double",
    )
    ed = apply_pipeline(docs, [{"$editDistanceDedup": {"maxNorm": 0.3}}]).collect()
    assert [(r["id_a"], r["id_b"]) for r in ed] == [(1, 2)]

    reps = apply_pipeline(
        docs, [{"$clusterRepresentatives": {"scoreField": "quality",
                                            "threshold": 0.5}}]
    ).collect()
    assert sorted(r["doc_id"] for r in reps) == [1, 3]  # keeps best of {1,2}

    emb = spark.createDataFrame(
        [(1, 1.0, [1.0, 0.0]), (2, 0.99, [0.999, 0.01]), (3, 0.9, [0.0, 1.0])],
        "vec_id long, score double, embedding array<float>",
    )
    sel = apply_pipeline(
        emb, [{"$mmrSelect": {"scoreField": "score", "k": 2, "lambda": 0.5}}]
    ).collect()
    assert sorted(r["vec_id"] for r in sel) == [1, 3]


def test_funnel_and_retention_stages(spark):
    import datetime as dt

    from route81_spark.pipeline import apply_pipeline

    ev = spark.createDataFrame(
        [
            (1, "a", dt.datetime(2024, 1, 1, 10)),
            (1, "b", dt.datetime(2024, 1, 1, 11)),
            (2, "a", dt.datetime(2024, 1, 2, 10)),
        ],
        "user_id long, event_type string, ts timestamp",
    )
    fun = {r["step_name"]: r["n_users"] for r in apply_pipeline(
        ev, [{"$funnel": {"steps": ["a", "b"]}}]
    ).collect()}
    assert fun == {"a": 2, "b": 1}
    ret = apply_pipeline(ev, [{"$retention": {"periodS": 86400}}]).collect()
    assert any(r["offset"] == 0 and r["retention"] == 1.0 for r in ret)


def test_asof_stage_variants_and_compression(spark):
    import datetime as dt

    from route81_spark.pipeline import apply_pipeline, compiler

    trades = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 6))], "key int, ts timestamp"
    )
    quotes = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 5), 101.0)],
        "key int, ts timestamp, px double",
    )
    compiler.set_collection_resolver(lambda n: {"quotes": quotes}[n])
    try:
        for extra in ({"static": True}, {"sliceS": 3600}):
            out = apply_pipeline(
                trades, [{"$asofJoin": {"from": "quotes", "on": "key", **extra}}]
            ).collect()
            assert out[0]["px"] == 101.0, extra
    finally:
        compiler.set_collection_resolver(None)

    docs = spark.createDataFrame(
        [(1, "spam " * 200)], "doc_id long, text string"
    )
    cr = apply_pipeline(docs, [{"$compressionRatio": {}}]).collect()
    assert cr[0]["deflate_ratio"] < 0.1


def test_anomaly_stage(spark):
    import datetime as dt

    import pytest as pt

    from route81_spark.pipeline import apply_pipeline

    ev = spark.createDataFrame(
        [(1, i, dt.datetime(2024, 1, 1, 0, i), 10.0 + (i % 2)) for i in range(9)]
        + [(1, 9, dt.datetime(2024, 1, 1, 0, 9), 99.0)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    out = apply_pipeline(
        ev, [{"$anomaly": {"tiebreakField": "event_id"}}]
    ).collect()
    assert any(r["is_anomaly"] for r in out)
    with pt.raises(ValueError, match="tiebreakField"):
        apply_pipeline(ev, [{"$anomaly": {}}]).collect()


def test_r6_corpus_stages(spark):
    """$lineDedup / $bpeTrain / $qualityClassify reach their operators
    through the pipeline-JSON surface with argument mapping intact
    ($imageDedup is covered in test_ops)."""
    import pytest as pt
    from pyspark.sql import Row

    from route81_spark.pipeline import apply_pipeline

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, lab="seed", text="good doc words here"),
            Row(doc_id=2, lab="raw", text="good doc words here"),
            Row(doc_id=3, lab="raw", text="zz yy xx ww vv"),
        ]
    )
    ld = {r["doc_id"]: r for r in apply_pipeline(
        docs, [{"$lineDedup": {"window": 2}}]).collect()}
    assert ld[1]["n_kept"] == 2 and ld[2]["n_kept"] == 0 and ld[3]["n_kept"] > 0

    bpe = apply_pipeline(docs, [{"$bpeTrain": {"merges": 2}}]).collect()
    assert [r["step"] for r in sorted(bpe, key=lambda r: r["step"])] == [1, 2]
    with pt.raises(KeyError):
        apply_pipeline(docs, [{"$bpeTrain": {}}]).collect()

    qc = {r["doc_id"]: r for r in apply_pipeline(
        docs, [{"$qualityClassify": {"seedField": "lab", "seedValue": "seed"}}]
    ).collect()}
    assert qc[2]["pred_keep"] == 1 and qc[3]["pred_keep"] == 0
    with pt.raises(ValueError, match="seedField"):
        apply_pipeline(docs, [{"$qualityClassify": {}}]).collect()


def test_bpe_encode_stage(spark):
    import pytest as pt
    from pyspark.sql import Row

    from route81_spark.pipeline import apply_pipeline

    docs = spark.createDataFrame([Row(doc_id=1, text="lest best")])
    out = apply_pipeline(
        docs, [{"$bpeEncode": {"merges": [["e", "s"], ["es", "t"]]}}]
    ).collect()
    by_word = {}
    for r in out:
        by_word.setdefault(r["wpos"], []).append((r["spos"], r["sym"]))
    assert [s for _, s in sorted(by_word[0])] == ["l", "est", "\x03"]
    assert [s for _, s in sorted(by_word[1])] == ["b", "est", "\x03"]
    trained = apply_pipeline(docs, [{"$bpeEncode": {"trainMerges": 2}}])
    assert trained.count() > 0
    with pt.raises(ValueError, match="bpeEncode"):
        apply_pipeline(docs, [{"$bpeEncode": {}}]).collect()


def test_video_dedup_stage(spark):
    from pyspark.sql import Row

    from route81_spark.pipeline import apply_pipeline

    frames = spark.createDataFrame(
        [Row(media_id=1, frame_sha=s) for s in "abcd"]
        + [Row(media_id=2, frame_sha=s) for s in "abc"]
        + [Row(media_id=3, frame_sha=s) for s in "wxyz"]
    )
    out = apply_pipeline(frames, [{"$videoDedup": {"threshold": [3, 10]}}])
    assert sorted(r["media_id"] for r in out.collect()) == [1, 3]


def test_decontaminate_excise_stage(spark):
    import pytest as pt
    from pyspark.sql import Row

    from route81_spark.pipeline import apply_pipeline, compiler

    bench = spark.createDataFrame([Row(doc_id=9, text="a b c d e")])
    docs = spark.createDataFrame([Row(doc_id=1, text="x a b c d e y")])
    compiler.set_collection_resolver(lambda name: {"bench": bench}[name])
    try:
        out = apply_pipeline(
            docs, [{"$decontaminateExcise": {"from": "bench", "n": 5}}]
        ).collect()
        assert out[0]["clean_text"] == "x y" and out[0]["n_dropped"] == 5
        with pt.raises(ValueError, match="from"):
            apply_pipeline(docs, [{"$decontaminateExcise": {}}]).collect()
    finally:
        compiler.set_collection_resolver(None)


def test_quality_apply_stage(spark):
    import pytest as pt
    from pyspark.sql import Row

    from route81_spark.ops.corpus import quality_model
    from route81_spark.pipeline import apply_pipeline, compiler

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, lab="seed", text="good words make good docs here"),
            Row(doc_id=2, lab="raw", text="good words make good docs here"),
            Row(doc_id=3, lab="raw", text="zz yy xx ww vv uu"),
        ]
    )
    inline = {r["doc_id"]: r for r in apply_pipeline(
        docs, [{"$qualityApply": {"trainSeedField": "lab", "seedValue": "seed"}}]
    ).collect()}
    assert inline[2]["pred_keep"] == 1 and inline[3]["pred_keep"] == 0
    # pre-trained model through the collection resolver
    from pyspark.sql import functions as SF

    model = quality_model(docs, SF.col("lab") == "seed")
    compiler.set_collection_resolver(lambda name: {"qmodel": model}[name])
    try:
        via_model = {r["doc_id"]: r for r in apply_pipeline(
            docs, [{"$qualityApply": {"modelFrom": "qmodel"}}]
        ).collect()}
        assert {k: (v["score"], v["pred_keep"]) for k, v in via_model.items()} == \
               {k: (v["score"], v["pred_keep"]) for k, v in inline.items()}
    finally:
        compiler.set_collection_resolver(None)
    with pt.raises(ValueError, match="qualityApply"):
        apply_pipeline(docs, [{"$qualityApply": {}}]).collect()
