"""$text stopWords option: Mongo's text index drops language stop
words from the indexed token stream AND the query terms (route81
ships $text to that index, route81.go:181-197); this engine opts in
per query with {stopWords: true} (documented divergence: the engine
default keeps stop words so existing queries stay stable). The list
is the Snowball English stopword list (ops/stopwords.py), shared as
data with the DuckDB oracle.
"""

from __future__ import annotations

import pytest

from route81_spark.ops.stopwords import STOP_EN
from route81_spark.pipeline import apply_pipeline
from route81_spark.pipeline.exprs import PipelineCompileError


def _df(spark):
    return spark.createDataFrame(
        [(1, "the data is in the lake"),
         (2, "data processing runs daily"),
         (3, "the the same very should now"),
         (4, "is it about data")],
        "doc_id long, text string",
    )


def test_stop_terms_drop_from_query_and_tokens(spark):
    out = apply_pipeline(_df(spark), [
        {"$match": {"$text": {"$search": "the data", "stopWords": True}}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ])
    # 'the' contributes nothing as a query term; doc 3 (all stop
    # words) can never match; stop tokens score nothing
    assert sorted((r["doc_id"], r["score"]) for r in out.collect()) == [
        (1, 1), (2, 1), (4, 1)
    ]


def test_all_stop_words_search_matches_nothing(spark):
    out = apply_pipeline(_df(spark), [
        {"$match": {"$text": {
            "$search": "the is about", "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out.count() == 0


def test_stop_removal_precedes_stemming(spark):
    # Mongo's analyzer order: tokenize -> stop -> stem. 'runs' stems
    # to 'run' and matches doc 2's 'runs'; doc 1/3/4 have no
    # non-stop token stemming to 'run'
    out = apply_pipeline(_df(spark), [
        {"$match": {"$text": {
            "$search": "runs", "stem": "porter", "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_negated_stop_word_is_dropped_not_enforced(spark):
    # '-the' is a stop word: dropped from the negation list, so docs
    # containing 'the' still match on 'data'
    out = apply_pipeline(_df(spark), [
        {"$match": {"$text": {
            "$search": "data -the", "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 4]


def test_phrases_keep_their_stop_words(spark):
    # phrases are raw substring matches: stop words inside the quotes
    # stay significant
    out = apply_pipeline(_df(spark), [
        {"$match": {"$text": {
            "$search": '"in the lake"', "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_loud_errors_for_uncovered_languages(spark):
    with pytest.raises(PipelineCompileError, match="English stop list"):
        apply_pipeline(_df(spark), [
            {"$match": {"$text": {
                "$search": "x", "$language": "french", "stopWords": True,
            }}},
        ]).collect()
    with pytest.raises(PipelineCompileError, match="languageOverride"):
        apply_pipeline(_df(spark), [
            {"$match": {"$text": {
                "$search": "x", "stem": "porter",
                "languageOverride": "lang", "stopWords": True,
            }}},
        ]).collect()


def test_bm25_stop_words_option(spark):
    """bm25_scores(stop_words=True): stop tokens leave the model (dl
    counts the remainder) and stop query terms drop; an all-stop query
    fails loudly; French composition fails loudly."""
    from route81_spark.ops.corpus import bm25_scores

    df = spark.createDataFrame(
        [(1, "the lake data"), (2, "data data is the")],
        "doc_id long, text string",
    )
    scored = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, ["the", "data"], stop_words=True).collect()
    }
    # with stops removed, dl(doc1)=2 ('lake data'), dl(doc2)=2
    # ('data data'): equal lengths, so doc2's tf=2 must outscore
    no_stop = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, ["data"]).collect()
    }
    assert scored[2] > scored[1] > 0
    # 'the' contributed nothing: same result as querying 'data' alone
    only_data = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, ["data"], stop_words=True).collect()
    }
    assert scored == only_data
    assert set(no_stop) == {1, 2}  # baseline path still works
    with pytest.raises(ValueError, match="stop word"):
        bm25_scores(df, ["the", "is"], stop_words=True)
    with pytest.raises(ValueError, match="English stop"):
        bm25_scores(df, ["données"], stem="french", stop_words=True)


def test_stem_stage_stop_words_option(spark):
    out = apply_pipeline(_df(spark), [
        {"$stem": {"textField": "text", "as": "st", "mode": "porter",
                   "stopWords": True}},
        {"$match": {"doc_id": 1}},
    ])
    # "the data is in the lake" -> stops removed -> ['data', 'lake']
    assert list(out.collect()[0]["st"]) == ["data", "lake"]
    with pytest.raises(ValueError, match="English stop list"):
        apply_pipeline(_df(spark), [
            {"$stem": {"mode": "french", "stopWords": True}},
        ])


def test_list_is_the_contraction_free_snowball_list():
    # spot pins on the shared data: classic members in, non-members
    # out, the tokenizer-fragment entries present
    assert {"the", "is", "and", "very", "s", "t", "now"} <= set(STOP_EN)
    assert "data" not in STOP_EN and "aren" not in STOP_EN
    assert len(STOP_EN) == 127 == len(set(STOP_EN))
