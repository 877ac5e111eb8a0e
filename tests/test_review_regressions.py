"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row, functions as F

from route81_spark.pipeline import apply_pipeline
from route81_spark.pipeline.exprs import PipelineCompileError


def test_project_id_only_exclusion(spark):
    df = spark.createDataFrame([Row(_id="a", x=1, y=2)], "_id string, x int, y int")
    out = apply_pipeline(df, [{"$project": {"_id": 0}}])
    assert out.columns == ["x", "y"]  # was: dropped everything


def test_cosine_zero_vector_yields_null_not_crash(spark):
    from route81_spark.ops.similarity import brute_force_topk

    emb = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 0.0]), Row(vec_id=2, embedding=[0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter("vec_id = 1").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    rows = brute_force_topk(emb, q, k=2).collect()
    # zero vector scores null -> sorts last, job does not abort (ANSI)
    assert rows[0]["vec_id"] == 1 and rows[0]["score"] == pytest.approx(1.0)


def test_quality_score_empty_text(spark):
    from route81_spark.ops.text import quality_score

    df = spark.createDataFrame([Row(t=""), Row(t="   "), Row(t="hi there")], "t string")
    vals = [r["q"] for r in df.select(quality_score(F.col("t")).alias("q")).collect()]
    assert vals[0] == 0.0 and vals[1] == 0.0 and vals[2] > 0


def test_plain_json_string_field_not_corrupted(spark):
    from route81_spark.codecs.plainjson import plain_json_string

    df = spark.createDataFrame(
        [Row(s="NaN", d=float("nan"), inf_note="Infinity")],
        "s string, d double, inf_note string",
    ).select(F.struct("s", "d", "inf_note").alias("v"))
    out = json.loads(
        df.select(plain_json_string(F.col("v"), df.schema["v"].dataType).alias("j"))
        .collect()[0]["j"]
    )
    assert out["s"] == "NaN" and out["inf_note"] == "Infinity"  # untouched strings
    assert out["d"] == "nan"  # double rewritten


def test_main_entry_compiles_extension_stages(spark):
    # extension stages must resolve even when route81_spark.ops was
    # never imported by the entry point (lazy registration)
    import sys

    for mod in [m for m in list(sys.modules) if m.startswith("route81_spark.ops")]:
        del sys.modules[mod]
    import route81_spark.pipeline.compiler as C

    C.EXTRA_STAGES.clear()
    fn = C.compile_pipeline([{"$dedupExact": {"textField": "t", "idField": "i"}}])
    df = spark.createDataFrame([Row(i=1, t="x"), Row(i=2, t="x")], "i long, t string")
    assert fn(df).count() == 1


def test_apply_changes_custom_keys(spark):
    from route81_spark.sinks.merge import apply_changes

    target = spark.createDataFrame([Row(k="1", v=1)], "k string, v int")
    changes = spark.createDataFrame(
        [Row(ck="1", is_delete=True, doc=None, seq=1)],
        "ck string, is_delete boolean, doc struct<k:string,v:int>, seq int",
    )
    out = apply_changes(target, changes, key="ck", target_key="k")
    assert out.count() == 0


def test_trim_chars(spark):
    df = spark.createDataFrame([Row(s="xxhixx")], "s string")
    out = apply_pipeline(
        df, [{"$project": {"t": {"$trim": {"input": "$s", "chars": "x"}}}}]
    ).collect()[0]
    assert out["t"] == "hi"
    with pytest.raises(PipelineCompileError):
        apply_pipeline(df, [{"$project": {"t": {"$ltrim": {"input": "$s", "chars": "x"}}}}])


def test_map_type_envelope_roundtrip(spark):
    from route81_spark.envelope import build_envelope
    from route81_spark.model.schemas import decode_envelope

    df = spark.createDataFrame(
        [Row(_id="m1", kv={"a": 1, "b": 2})],
        "_id string, kv map<string,int>",
    )
    env = build_envelope(df, "db.c", id_col="_id", data_cols=["_id", "kv"])
    decoded = env.select(decode_envelope(F.col("value"), df.schema).alias("m")).select(
        "m.data.*"
    )
    row = decoded.collect()[0]
    assert row["kv"] == {"a": 1, "b": 2}


def test_cluster_deep_chain_star_fallback(spark):
    from route81_spark.ops.dedup import near_dup_clusters

    # chain 0-1-2-...-9: diameter 9 exceeds max_iter=2, so label
    # propagation hands off to large-star/small-star (diameter-
    # independent) instead of raising or returning intermediate labels
    pairs = spark.createDataFrame(
        [Row(id_a=i, id_b=i + 1) for i in range(9)], "id_a long, id_b long"
    )
    fb = near_dup_clusters(pairs, max_iter=2, small_graph_max_edges=0)
    assert {(r["doc_id"], r["cluster_id"]) for r in fb.collect()} == {
        (i, 0) for i in range(10)
    }
    ok = near_dup_clusters(pairs, max_iter=15, small_graph_max_edges=0)
    assert {r["cluster_id"] for r in ok.collect()} == {0}
