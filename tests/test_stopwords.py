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


def _fr_df(spark):
    return spark.createDataFrame(
        [(1, "les continuations ont été majestueuses"),
         (2, "elle continuait librement"),
         (3, "été les de la même"),          # all stop words
         (4, "rien de notable ici")],
        "doc_id long, text string",
    )


def test_french_stop_words_compose_with_french_stemming(spark):
    # r11: {stopWords: true} + $language french applies the FRENCH
    # list. 'les'/'été' drop as query terms; 'continuer' stems to
    # 'continu' and conflates with continuations/continuait; doc 3
    # (all French stop words) can never match.
    out = apply_pipeline(_fr_df(spark), [
        {"$match": {"$text": {
            "$search": "les continuer été", "$language": "french",
            "stopWords": True,
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ])
    assert sorted((r["doc_id"], r["score"]) for r in out.collect()) == [
        (1, 1), (2, 1)
    ]


def test_french_accented_stop_word_filters_before_fold(spark):
    # 'été' is IN the French list with its accents: the stop filter
    # must see the UNfolded token (the fold happens after stemming in
    # the French analyzer order). An all-stop search matches nothing.
    out = apply_pipeline(_fr_df(spark), [
        {"$match": {"$text": {
            "$search": "été les même", "$language": "french",
            "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out.count() == 0
    # without stopWords, 'été' is a real query term: doc 1 and 3
    # carry the token (stem 'été' -> folded 'ete')
    out2 = apply_pipeline(_fr_df(spark), [
        {"$match": {"$text": {
            "$search": "été", "$language": "french",
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert sorted(r["doc_id"] for r in out2.collect()) == [1, 3]


def test_language_override_stops_per_document_language(spark):
    # r11: under languageOverride each document stops with ITS
    # language's list; unknown languages are unstopped AND unstemmed.
    df = spark.createDataFrame(
        [(1, "en", "the data runs daily"),      # 'the' stops (EN)
         (2, "fr", "les continuations de data"), # 'les'/'de' stop (FR)
         (3, "xx", "the data les runs"),         # nothing stops/stems
         (4, "en", "the the is was")],           # all EN stops
        "doc_id long, lang string, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "data", "stem": "porter",
            "languageOverride": "lang", "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    # doc 2 does NOT match: its French analyzer stems 'data' -> 'dat'
    # (step 2b verb suffix) while the ENGLISH query term stays 'data'
    # — the same cross-language index/query mismatch a Mongo text
    # index has; doc 3's raw unstemmed 'data' matches directly
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
    # a French query against the same override matches doc 2 on the
    # shared French stem ('continuer' -> 'continu')
    out_fr = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "continuer", "$language": "french",
            "languageOverride": "lang", "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert sorted(r["doc_id"] for r in out_fr.collect()) == [2]
    # 'the' is an English query term (query language = english):
    # dropped, so nothing matches on it alone
    out2 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "the", "stem": "porter",
            "languageOverride": "lang", "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out2.count() == 0
    # unknown-language docs keep their stop-word tokens: a non-stop
    # query term present only as 'les' in doc 3 still matches there
    # ('les' is not in the ENGLISH list, so it survives as a query
    # term, and doc 3's tokens are unstopped) — doc 2's 'les' was
    # removed by the French list
    out3 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "les", "stem": "porter",
            "languageOverride": "lang", "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert sorted(r["doc_id"] for r in out3.collect()) == [3]


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
    # an EMPTY query raises the generic message, not the stop-word one
    with pytest.raises(ValueError, match="at least one query term"):
        bm25_scores(df, [], stop_words=True)


def test_bm25_french_stop_words(spark):
    """r11: stop_words composes with stem='french' — the FRENCH list
    filters corpus tokens and query terms; 'les'/'été' drop, the
    surviving term stems and scores."""
    from route81_spark.ops.corpus import bm25_scores

    df = spark.createDataFrame(
        [(1, "les continuations été majestueuses"),
         (2, "elle continuait continuait librement")],
        "doc_id long, text string",
    )
    scored = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(
            df, ["les", "continuer", "été"], stem="french",
            stop_words=True,
        ).collect()
    }
    # 'les'/'été' contribute nothing: same scores as 'continuer' alone
    only = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(
            df, ["continuer"], stem="french", stop_words=True
        ).collect()
    }
    assert scored == only
    # doc 2 has tf=2 on the stem 'continu' with dl 3 vs doc 1's tf=1
    # dl 2 — with k1=1.2/b=0.75 the double occurrence wins
    assert scored[2] > scored[1] > 0
    with pytest.raises(ValueError, match="every query term is a stop"):
        bm25_scores(df, ["les", "été"], stem="french", stop_words=True)


def test_bm25_german_stem_and_stop_words(spark):
    """r12: stem='german' (Snowball German, ops/german.py) conflates
    corpus tokens and query terms — 'kinder' scores 'kindern'/'kindes'
    docs via the shared stem 'kind' — and stop_words composes with it
    the analyzer way: the GERMAN list filters both sides BEFORE
    stemming ('über'/'die' contribute nothing; 'alles' stops before
    the stemmer could conflate it to 'all')."""
    from route81_spark.ops.corpus import bm25_scores

    df = spark.createDataFrame(
        [(1, "die kindern über alles"),
         (2, "kindes kindern verarbeitung")],
        "doc_id long, text string",
    )
    scored = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(
            df, ["die", "kinder", "über"], stem="german",
            stop_words=True,
        ).collect()
    }
    only = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(
            df, ["kinder"], stem="german", stop_words=True
        ).collect()
    }
    assert scored == only
    # post-stop dl(doc1)=1 ('kindern' alone — die/über/alles stop),
    # dl(doc2)=3: with k1=1.2/b=0.75 the all-signal doc 1 (tf=1/dl=1,
    # 2.2/1.75) outscores doc 2 (tf=2/dl=3, 4.4/3.65) — 0.229 vs
    # 0.220, the same post-stop length-normalization effect the
    # stop_language test pins; both positive proves the stem
    # conflation hit BOTH docs ('kinder' itself appears in neither)
    assert scored[1] > scored[2] > 0
    with pytest.raises(ValueError, match="every query term is a stop"):
        bm25_scores(df, ["über", "die"], stem="german", stop_words=True)
    # stop_language still composes with stem=None only — the german
    # MODE's language already picks the list
    with pytest.raises(ValueError, match="stem=None only"):
        bm25_scores(df, ["kinder"], stem="german", stop_words=True,
                    stop_language="german")


def test_bm25_stop_language_generic(spark):
    """r11: stop_language picks any carried Snowball list for an
    UNSTEMMED corpus — German stop words leave the model and the
    query; incoherent combinations fail loudly."""
    from route81_spark.ops.corpus import bm25_scores

    df = spark.createDataFrame(
        [(1, "die daten über alles"),
         (2, "daten daten verarbeitung")],
        "doc_id long, text string",
    )
    scored = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(
            df, ["die", "daten"], stop_words=True,
            stop_language="german",
        ).collect()
    }
    only = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(
            df, ["daten"], stop_words=True, stop_language="de"
        ).collect()
    }
    # 'die' contributed nothing, and the ISO code resolves the same
    # list; post-stop dl(doc1)=1 ('daten' alone — die/über/alles all
    # stop), dl(doc2)=3: k1=1.2/b=0.75 length normalization makes the
    # all-signal doc 1 (tf=1/dl=1) outscore doc 2 (tf=2/dl=3) —
    # 0.229 vs 0.220 — which is exactly why dl must count POST-stop
    # tokens
    assert scored == only
    assert scored[1] > scored[2] > 0
    with pytest.raises(ValueError, match="requires stop_words"):
        bm25_scores(df, ["daten"], stop_language="german")
    with pytest.raises(ValueError, match="stem=None only"):
        bm25_scores(df, ["daten"], stem="porter", stop_words=True,
                    stop_language="german")
    with pytest.raises(ValueError, match="carried"):
        bm25_scores(df, ["daten"], stop_words=True,
                    stop_language="klingon")


def test_wildcard_fields_compose_with_stop_words(spark):
    """{fields: "$**"} x {stopWords: true}: the stop filter applies
    per expanded field (title AND body), query stop terms drop, and a
    field of only stop words contributes nothing."""
    df = spark.createDataFrame(
        [(1, "the data guide", "about processing"),
         (2, "the the is", "data daily"),
         (3, "misc intro", "nothing here")],
        "doc_id long, title string, body string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "the data is processing",
            "fields": "$**", "stopWords": True,
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ])
    # doc 1: 'data' in title + 'processing' in body = 2 (the/about
    # stop); doc 2: all-stop title contributes 0, 'data' in body = 1
    assert sorted((r["doc_id"], r["score"]) for r in out.collect()) == [
        (1, 2), (2, 1)
    ]


def test_stem_stage_rejects_stop_language(spark):
    # silently ignoring the key would stop the WRONG language; loud
    with pytest.raises(ValueError, match="stopLanguage"):
        apply_pipeline(_df(spark), [
            {"$stem": {"textField": "text", "stopWords": True,
                       "stopLanguage": "german"}},
        ])


def test_stem_stage_stop_words_option(spark):
    out = apply_pipeline(_df(spark), [
        {"$stem": {"textField": "text", "as": "st", "mode": "porter",
                   "stopWords": True}},
        {"$match": {"doc_id": 1}},
    ])
    # "the data is in the lake" -> stops removed -> ['data', 'lake']
    assert list(out.collect()[0]["st"]) == ["data", "lake"]


def test_stem_stage_french_stop_words(spark):
    # r11: mode 'french' + stopWords applies the FRENCH list before
    # stemming; the accented stop word 'été' must drop (the stage's
    # whitespace tokenizer keeps diacritics intact)
    out = apply_pipeline(_fr_df(spark), [
        {"$stem": {"textField": "text", "as": "st", "mode": "french",
                   "stopWords": True}},
        {"$match": {"doc_id": 1}},
    ])
    # "les continuations ont été majestueuses" -> FR stops removed ->
    # [continuations, majestueuses] -> stems (accents intact)
    from route81_spark.ops.french import french_py

    assert list(out.collect()[0]["st"]) == [
        french_py("continuations"), french_py("majestueuses")
    ]


def test_list_is_the_contraction_free_snowball_list():
    # spot pins on the shared data: classic members in, non-members
    # out, the tokenizer-fragment entries present
    assert {"the", "is", "and", "very", "s", "t", "now"} <= set(STOP_EN)
    assert "data" not in STOP_EN and "aren" not in STOP_EN
    assert len(STOP_EN) == 127 == len(set(STOP_EN))


def test_generic_language_stop_lists(spark):
    """r11: {stopWords: true} with any carried Mongo text language
    applies THAT language's Snowball list (loaded from the PySpark
    distribution's own MLlib stopwords resource) — stemming for those
    languages stays honestly not-carried (stop-without-stem). The
    umlaut stop word 'über' must filter from documents even though
    the default diacritic fold runs before tokenization (the list
    folds with the tokens)."""
    df = spark.createDataFrame(
        [(1, "die Daten über alles"),   # die/über/alles stop (DE)
         (2, "Daten verarbeitung täglich"),
         (3, "die der und über")],      # all German stop words
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "die daten über", "$language": "german",
            "unicode": True, "stopWords": True,
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ])
    # 'die'/'über' drop as query terms; doc 3 (all stops) never
    # matches; scores count only the surviving 'daten' occurrences
    assert sorted((r["doc_id"], r["score"]) for r in out.collect()) == [
        (1, 1), (2, 1)
    ]
    # the folded equivalent 'uber' also stops under the default
    # diacritic-INsensitive mode ('uber' ≡ 'über', for stopping
    # exactly as for matching)
    out2 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "uber", "$language": "german",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out2.count() == 0


def test_stop_language_none_and_uncarried_are_honest(spark):
    from route81_spark.pipeline.exprs import PipelineCompileError

    df = spark.createDataFrame(
        [(1, "the data lake")], "doc_id long, text string"
    )
    # $language: "none" = no analysis in Mongo: nothing stops
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "the", "$language": "none", "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out.count() == 1
    # ... even when an explicit engine stem extension is set: the
    # declared document language wins for STOPPING (stemming is still
    # honored — 'the' stems to itself and matches)
    out_stem = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "the", "$language": "none", "stem": "porter",
            "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out_stem.count() == 1
    # romanian's list is not carried: loud error, never a wrong list
    with pytest.raises(PipelineCompileError, match="romanian"):
        apply_pipeline(df, [
            {"$match": {"$text": {
                "$search": "x", "$language": "romanian",
                "stopWords": True,
            }}},
        ])
    with pytest.raises(PipelineCompileError, match="carried"):
        apply_pipeline(df, [
            {"$match": {"$text": {
                "$search": "x", "$language": "klingon",
                "stopWords": True,
            }}},
        ])


def test_explicit_stem_contradicting_language_fails_loudly(spark):
    """r12 (review finding): {stem: 'porter', $language: 'german',
    stopWords: true} used to silently honor the stem arm and stop
    German-declared text with the ENGLISH list — a contradiction the
    other dispatch arms fail loudly on. Now PipelineCompileError; the
    non-contradictory combos stay accepted."""
    from route81_spark.pipeline.exprs import PipelineCompileError

    df = spark.createDataFrame(
        [(1, "the data lake")], "doc_id long, text string"
    )
    for stem_mode, lang in [("porter", "german"), ("s", "french"),
                            ("french", "german"), ("porter", "fr"),
                            ("german", "english"), ("german", "fr")]:
        with pytest.raises(PipelineCompileError, match="contradicts"):
            apply_pipeline(df, [
                {"$match": {"$text": {
                    "$search": "x", "stem": stem_mode,
                    "$language": lang, "stopWords": True,
                }}},
            ])
    # agreeing / unset / 'none' language combos are NOT contradictions
    for spec in [
        {"$search": "the", "stem": "porter", "stopWords": True},
        {"$search": "the", "stem": "porter", "$language": "en",
         "stopWords": True},
        {"$search": "the", "stem": "s", "$language": "english",
         "stopWords": True},
        {"$search": "the", "stem": "porter", "$language": "none",
         "stopWords": True},
        # without stopWords the stem override remains the documented
        # engine extension (no list is chosen, nothing to contradict)
        {"$search": "the", "stem": "porter", "$language": "german"},
    ]:
        apply_pipeline(df, [{"$match": {"$text": spec}}]).count()


def test_stop_list_loader():
    """stop_list(): en/fr return the vendored constants (single source
    with the oracles); the other twelve load the Snowball lists from
    the Spark jar; Mongo names and ISO codes both resolve. The
    constants import INSIDE the test: identity must hold against the
    CURRENT module instance (test_review_regressions deletes
    route81_spark.ops* from sys.modules mid-suite, so a module-level
    binding would be a stale tuple object)."""
    from route81_spark.ops.stopwords import (
        STOP_EN as EN, STOP_FR, stop_list,
    )

    assert stop_list("english") is EN
    assert stop_list("fr") is STOP_FR
    de = stop_list("german")
    assert {"der", "die", "das", "und", "über"} <= set(de)
    assert stop_list("de") == de
    ru = stop_list("russian")
    assert "что" in ru and len(ru) == 151
    # counts are post-dedupe (the raw finnish/hungarian/norwegian
    # resource files repeat a few lines)
    for name, n in [("danish", 94), ("dutch", 101), ("finnish", 229),
                    ("german", 231), ("hungarian", 198),
                    ("italian", 279), ("norwegian", 172),
                    ("portuguese", 203), ("spanish", 313),
                    ("swedish", 114), ("turkish", 53)]:
        ws = stop_list(name)
        assert len(ws) == n == len(set(ws)), name
    with pytest.raises(ValueError, match="'ro'"):
        stop_list("ro")
    with pytest.raises(ValueError, match="carried"):
        stop_list("tlh")


def test_case_sensitive_stopping_is_case_insensitive(spark):
    """$caseSensitive: true changes MATCHING, not stopping: Mongo
    stops on the lowercased token, so 'The' still drops from both
    sides (the engine's drop_stops lowercases for the comparison)."""
    df = spark.createDataFrame(
        [(1, "The Data Lake"), (2, "THE THE IS")],
        "doc_id long, text string",
    )
    # 'The' drops as a query term (case-insensitive stop check), so
    # only 'Data' remains and matches doc 1 case-sensitively
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "The Data", "$caseSensitive": True,
            "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert [r["doc_id"] for r in out.collect()] == [1]
    # the all-stop doc (whatever its case) can never match
    out2 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "THE IS", "$caseSensitive": True,
            "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out2.count() == 0


def test_stop_symmetry_across_languages(spark):
    """The analyzer INVARIANT behind every stop path: a single-word
    document matches the same single-word search iff the word is NOT
    a stop word — i.e. document tokens and query terms always agree
    on what stops (no one-sided filtering, whatever the language or
    fold mode). One pipeline per language: every sampled word is its
    own doc, the search carries all of them, and the matched set must
    be exactly the non-stop sample."""
    from route81_spark.ops.stopwords import stop_list

    cases = {
        # language -> (stop samples, non-stop samples, extra spec)
        "english": (["the", "is", "very"], ["data", "lake"], {}),
        "french": (["été", "même", "les"], ["jouet", "rien"],
                   {"$language": "french"}),
        "german": (["über", "der", "und"], ["daten", "haus"],
                   {"$language": "german", "unicode": True}),
        "russian": (["что", "не", "она"], ["спарк", "поток"],
                    {"$language": "russian", "unicode": True}),
    }
    for lang, (stops, keeps, extra) in cases.items():
        for w in stops:
            assert w in stop_list(lang), (lang, w)
        for w in keeps:
            assert w not in stop_list(lang), (lang, w)
        words = stops + keeps
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)],
            "doc_id long, text string",
        )
        out = apply_pipeline(df, [
            {"$match": {"$text": {
                "$search": " ".join(words), "stopWords": True, **extra,
            }}},
            {"$project": {"doc_id": 1}},
        ])
        got = {words[r["doc_id"]] for r in out.collect()}
        # French non-stop terms stem before matching, so the stemmed
        # single-word docs still match their own search terms (same
        # analyzer both sides) — the assert holds for every language
        assert got == set(keeps), (lang, got)


def test_french_list_matches_sparks_snowball_resource():
    """STOP_FR is the verbatim Snowball french.stop list. Pin it
    byte-for-byte against the copy Apache Spark ships as the MLlib
    StopWordsRemover resource (same provenance: the PostgreSQL
    snowball stopword corpus — see the jar's stopwords/README), so
    the vendored data can never drift from the published list."""
    import glob
    import os
    import zipfile

    import pyspark

    from route81_spark.ops.stopwords import STOP_FR

    jars = glob.glob(os.path.join(
        os.path.dirname(pyspark.__file__), "jars", "spark-mllib_*.jar"
    ))
    assert jars, "spark-mllib jar not found next to the pyspark package"
    with zipfile.ZipFile(jars[0]) as z:
        ref = [
            w.strip()
            for w in z.read(
                "org/apache/spark/ml/feature/stopwords/french.txt"
            ).decode("utf-8").splitlines()
            if w.strip()
        ]
    assert list(STOP_FR) == ref
    assert len(STOP_FR) == 156 == len(set(STOP_FR))
    # accented members present with their accents (the filter must
    # run before any diacritic fold) and elision fragments carried
    assert {"été", "même", "être"} & set(STOP_FR) == {"été", "même"}
    assert {"l", "d", "j", "c"} <= set(STOP_FR)
